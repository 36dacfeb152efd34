"""Orbax checkpointing.

Persists exactly what the reference persists (reference
train_adamml.py:373-383): model params + BN stats, both optimizer states,
Gumbel temperature, plus host metadata {epoch, stage, best_top1, arch}.
Layout mirrors the reference writer (reference utils/utils.py:89-96):

  <dir>/checkpoint            -- always-overwritten latest
  <dir>/checkpoint<sfx>_NN    -- per-epoch copy when epoch is given
  <dir>/model_best            -- copy on val-top-1 improvement

Only process 0 writes (reference train_adamml.py:471,583).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ..train.train_state import AdaMMLTrainState

_META = "meta.json"


def _to_saveable(state: AdaMMLTrainState) -> dict:
    d = {"params": state.params, "batch_stats": state.batch_stats,
         "main_opt": state.main_opt, "temperature": state.temperature,
         "step": state.step}
    if state.policy_opt is not None:
        d["policy_opt"] = state.policy_opt
    return d


def save_checkpoint(state: AdaMMLTrainState, meta: dict, filepath: str,
                    is_best: bool = False, epoch: Optional[int] = None,
                    suffix: str = "") -> str:
    """Write the latest checkpoint (+ per-epoch / model_best copies).

    Orbax saves are COLLECTIVE under multi-process jax (it synchronizes all
    processes around the commit), so every process calls save; orbax writes
    from the primary only. File bookkeeping (meta, copies) stays on process
    0, fenced by global syncs -- the moral equivalent of the reference's
    rank-0 save + dist.barrier (reference train_adamml.py:355,471,583)."""
    multiproc = jax.process_count() > 1
    path = os.path.abspath(os.path.join(filepath, "checkpoint"))
    os.makedirs(filepath, exist_ok=True)
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("adamml_ckpt_clean")
    ckptr = ocp.StandardCheckpointer()
    # single process: host arrays (cheap); multi-process: hand orbax the
    # jax.Arrays so (possibly tensor-parallel-sharded) leaves save correctly
    payload = _to_saveable(state if multiproc else jax.device_get(state))
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, _META), "w") as f:
            json.dump(meta, f)
        if epoch is not None:
            dst = os.path.join(filepath, f"checkpoint{suffix}_{epoch:02d}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(path, dst)
        if is_best:
            dst = os.path.join(filepath, "model_best")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(path, dst)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("adamml_ckpt_done")
    return path


def peek_meta(path: str) -> dict:
    """Read a checkpoint's host metadata without restoring arrays (used to
    validate e.g. the optimizer-state layout before orbax touches the
    tree, where a mismatch would surface as an opaque structure error)."""
    with open(os.path.join(os.path.abspath(path), _META)) as f:
        return json.load(f)


def load_checkpoint(path: str, target_state: AdaMMLTrainState):
    """Restore (state, meta). `target_state` supplies the pytree structure
    and shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = _to_saveable(target_state)
    restored = ckptr.restore(path, target)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    state = target_state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        main_opt=restored["main_opt"],
        policy_opt=restored.get("policy_opt", target_state.policy_opt),
        temperature=restored["temperature"], step=restored["step"])
    return state, meta


class CheckpointManager:
    """Auto-resume helper (reference train_adamml.py:275-312)."""

    def __init__(self, log_folder: str) -> None:
        self.log_folder = log_folder

    def latest(self) -> Optional[str]:
        p = os.path.join(self.log_folder, "checkpoint")
        return p if os.path.exists(os.path.join(p, _META)) else None

    def best(self) -> Optional[str]:
        p = os.path.join(self.log_folder, "model_best")
        return p if os.path.exists(os.path.join(p, _META)) else None
