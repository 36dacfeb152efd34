"""Profiling hooks.

The reference's only observability is AverageMeter wall-clock timing
(reference utils/utils.py:24-39; SURVEY.md section 5.1). Here, per-step
timing stays (engine meters) and a jax.profiler trace can be captured for a
step window: set RuntimeConfig.profile_dir (CLI --profile_dir) and steps
[start, start+count) of the first epoch are traced to TensorBoard/XProf
format.
"""

from __future__ import annotations

from typing import Optional

import jax


class StepProfiler:
    def __init__(self, trace_dir: Optional[str], start_step: int = 2,
                 num_steps: int = 3) -> None:
        self.trace_dir = trace_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self._done = False

    def step(self, global_step: int) -> None:
        """Call once per step with the running step index."""
        if self.trace_dir is None or self._done:
            return
        if not self._active and global_step == self.start_step:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and global_step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
