"""Host batch -> model inputs, on device.

Bridges the loader's raw uint8/waveform batches to the canonical
(N, S, F, H, W, C) model inputs using the fused device ops:

  rgb     (N, T, Hc, Wc, 3)    -> crop/resize/flip/normalize -> (N,S,F,h,w,3)
  flow    (N, T*5, Hc, Wc, 2)  -> same + x-inversion on flip -> (N,S,F,h,w,10)
  rgbdiff (N, T*6, Hc, Wc, 3)  -> on-device diffs then same  -> (N,S,F,h,w,15)
  sound   (N, S, L) waveforms  -> batched log-power STFT      -> (N,S,1,256,256,1)
          zeroed where the wav was missing (reference
          utils/video_dataset.py:102-103 zero-image fallback)

Normalization constants follow the reference exactly (SURVEY.md section 2.4):
ImageNet mean/std for rgb/rgbdiff, [0.5]/[mean std] for flow (repeated over
the packed channels), and NO normalization for sound.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..configs.config import (modality_mean, modality_std)
from ..ops.augment import crop_resize_normalize, rgbdiff_from_frames
from ..ops.spectrogram import SpectrogramConfig, log_power_spectrogram


def _mean_std(modality: str, skip: bool, mean_override, std_override,
              channels: int):
    if skip:
        return None, None
    mean = tuple(mean_override) if mean_override else modality_mean(modality)
    std = tuple(std_override) if std_override else modality_std(modality)
    reps = channels // len(mean)
    return tuple(mean) * reps, tuple(std) * reps


def make_batch_preprocessor(cfg, *, train: bool,
                            num_segments: int) -> Callable:
    """Returns fn(host_batch) -> (inputs list, target) running on device."""
    mcfg, dcfg = cfg.model, cfg.data
    modality = list(mcfg.modality)
    out_size = dcfg.input_size
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
    groups = mcfg.groups
    spec_cfg = SpectrogramConfig(
        resampling_rate=int(dcfg.resampling_rate),
        audio_length=dcfg.audio_length)

    # Multi-crop oversample eval: (N, C, 4) crop rectangles fold into
    # the batch axis -> every modality contributes (N*C, ...) rows and
    # the eval step averages logits over the C crops (reference
    # GroupOverSample, utils/video_transforms.py:121-178). The crop count
    # comes from the CONFIG (the eval step reshapes by it), not from batch
    # introspection -- a sound-only model has no crop rectangles to inspect
    # but its rows must still fold so the step's reshape stays aligned.
    ncrops = 1 if train else max(1, int(cfg.data.num_crops))

    def preprocess(batch: Dict) -> Tuple[List[jax.Array], jax.Array]:
        inputs: List[jax.Array] = []
        for m in modality:
            if m == "sound":
                wave = jnp.asarray(batch["sound_wave"])        # (N, S, L)
                valid = jnp.asarray(batch["sound_valid"])      # (N, S)
                spec = log_power_spectrogram(wave, spec_cfg)   # (N, S, 256, 256)
                spec = spec * valid[..., None, None]
                spec = spec[:, :, None, :, :, None]            # (N,S,1,fh,fw,1)
                if ncrops > 1:  # sound has no spatial crops: repeat rows
                    spec = jnp.repeat(spec, ncrops, axis=0)
                inputs.append(spec.astype(dtype))
                continue

            frames = jnp.asarray(batch[f"{m}_frames"])
            crop = jnp.asarray(batch[f"{m}_crop"])
            flip = jnp.asarray(batch[f"{m}_flip"])
            if crop.ndim == 3:  # oversample: fold crops into batch
                assert crop.shape[1] == ncrops, (
                    f"{m}: {crop.shape[1]} crop rects vs num_crops={ncrops}")
                frames = jnp.repeat(frames, ncrops, axis=0)
                crop = crop.reshape((-1, 4))
                flip = flip.reshape((-1,))
            n = frames.shape[0]
            if m == "rgbdiff":
                # (N, P*6, Hc, Wc, 3) -> diffs (N, P*5, Hc, Wc, 3)
                p = frames.shape[1] // 6
                frames = frames.reshape((n, p, 6) + frames.shape[2:])
                frames = rgbdiff_from_frames(frames)
                frames = frames.reshape((n, p * 5) + frames.shape[3:])
            cons = {"rgb": 1, "flow": 5, "rgbdiff": 5}[m]
            base_c = frames.shape[-1]
            mean, std = _mean_std(m, dcfg.skip_normalization, dcfg.mean,
                                  dcfg.std, base_c)
            out = crop_resize_normalize(
                frames, crop, flip, out_size=out_size, mean=mean, std=std,
                flow_channels=(m == "flow"), compute_dtype=dtype)
            # (N, S*F*cons, h, w, c) -> (N, S, F, h, w, cons*c)
            out = out.reshape(n, num_segments, groups, cons, out_size,
                              out_size, base_c)
            out = jnp.transpose(out, (0, 1, 2, 4, 5, 3, 6))
            out = out.reshape(n, num_segments, groups, out_size, out_size,
                              cons * base_c)
            inputs.append(out)
        target = jnp.asarray(batch["target"])
        return inputs, target

    return preprocess


def make_unimodal_preprocessor(cfg, *, train: bool,
                               num_clips: int = 1) -> Callable:
    """Unimodal variant: returns fn(host_batch) -> (single input, target).

    Clips fold into the frame axis, so multi-clip eval gets the reference's
    frame-averaged logits for free: visual -> (N, clips*F, h, w, C), sound ->
    (N, clips, fh, fw, 1) (each clip one spectrogram "frame")."""
    multi = make_batch_preprocessor(cfg, train=train, num_segments=num_clips)
    m = cfg.model.modality[0]

    def preprocess(batch):
        inputs, target = multi(batch)
        x = inputs[0]
        n, s, f = x.shape[0], x.shape[1], x.shape[2]
        x = x.reshape((n, s * f) + x.shape[3:])
        return x, target

    return preprocess
