"""Synthetic multi-modal dataset for tests and benchmarks.

Mirrors the MultiVideoDataset payload contract exactly but generates
deterministic pseudo-random frames/waveforms per index -- no disk, no
decode -- so end-to-end training, sharding, and benchmark paths run without
Kinetics-Sounds on hand.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..configs.config import NUM_CONSECUTIVE_FRAMES


class SyntheticVideoDataset:
    def __init__(self, modality: Sequence[str], length: int = 256,
                 num_groups: int = 8, frames_per_group: int = 1,
                 num_clips: int = 1, num_classes: int = 31,
                 canvas_size: Tuple[int, int] = (256, 464),
                 audio_length: float = 1.28, resampling_rate: float = 24000,
                 is_train: bool = True, seed: int = 0) -> None:
        self.modality = list(modality)
        self.length = length
        self.num_frames = num_groups
        self.num_clips = num_clips
        self.num_classes = num_classes
        self.canvas_size = tuple(canvas_size)
        self.audio_length = audio_length
        self.resampling_rate = resampling_rate
        self.is_train = is_train
        self.seed = seed
        self.multi_label = False

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int):
        rng = np.random.RandomState((self.seed * 1000003 + index) % (2**31))
        ch, cw = self.canvas_size
        t = self.num_clips * self.num_frames
        out: Dict[str, Dict[str, np.ndarray]] = {}
        # all modalities share a plausible true size within the canvas
        h = min(256, ch)
        w = int(rng.randint(h, cw + 1)) if cw > h else cw
        hw = np.asarray([h, w], np.int32)
        for m in self.modality:
            if m == "sound":
                l = int(round(self.resampling_rate * self.audio_length))
                out[m] = {
                    "wave": rng.randn(self.num_clips, l).astype(np.float32) * 0.1,
                    "valid": np.ones((self.num_clips,), np.float32)}
            elif m == "rgb":
                frames = np.zeros((t, ch, cw, 3), np.uint8)
                frames[:, :h, :w] = rng.randint(0, 256, (t, h, w, 3),
                                                dtype=np.uint8)
                out[m] = {"frames": frames, "hw": hw.copy()}
            elif m == "flow":
                k = NUM_CONSECUTIVE_FRAMES["flow"]
                frames = np.zeros((t * k, ch, cw, 2), np.uint8)
                frames[:, :h, :w] = rng.randint(0, 256, (t * k, h, w, 2),
                                                dtype=np.uint8)
                out[m] = {"frames": frames, "hw": hw.copy()}
            else:  # rgbdiff raw consecutive frames
                k = NUM_CONSECUTIVE_FRAMES["rgbdiff"] + 1
                frames = np.zeros((t * k, ch, cw, 3), np.uint8)
                frames[:, :h, :w] = rng.randint(0, 256, (t * k, h, w, 3),
                                                dtype=np.uint8)
                out[m] = {"frames": frames, "hw": hw.copy()}
        label = int(rng.randint(self.num_classes))
        return out, label
