"""Fused device-side preprocessing.

The reference burns DataLoader-worker CPU on PIL resize/crop/flip/normalize
(reference utils/video_transforms.py; its own comment at
utils/video_transforms.py:341 notes the transpose eats 80% of loading time).
Here the host only decodes JPEGs into a fixed-size uint8 canvas; geometry and
normalization run on device as ONE jitted op with static shapes:

  * random-scale + random-crop (augmentor v2: reference utils/utils.py:131-135)
    and multi-scale crop (v1: reference utils/utils.py:127-130) are both
    expressed as a per-sample crop rectangle in source coordinates followed by
    a resize to the model size. scale-then-crop == crop-then-resize up to
    interpolation, so one `jax.image.scale_and_translate` (static output
    shape) covers every branch; the host supplies the sampled rectangles.
  * horizontal flip with flow-x inversion (reference
    utils/video_transforms.py:44-59) is a `jnp.where` on the resized output.
  * /255 + mean/std normalization (reference utils/video_transforms.py:62-84,
    321-343) fuses into the same kernel.

Crop/flip parameters are shared by all frames of a sample, matching the
Group* transforms that operate on the whole frame group.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _one_sample(frames, crop_xywh, flip, out_size, mean, std, invert_x_on_flip):
    """frames: (T, H, W, C) uint8; crop_xywh: (4,) float32; flip: () bool."""
    t, h, w, c = frames.shape
    x0, y0, cw, ch = crop_xywh[0], crop_xywh[1], crop_xywh[2], crop_xywh[3]
    scale_y = out_size / ch
    scale_x = out_size / cw
    scale = jnp.stack([scale_y, scale_x])
    translation = jnp.stack([-y0 * scale_y, -x0 * scale_x])
    # antialias=True: PIL's BILINEAR resampler (the reference interpolator,
    # torchvision Resize -> PIL) is an antialiased triangle filter, so
    # minification must widen the kernel by the scale ratio to match.
    out = jax.image.scale_and_translate(
        frames.astype(jnp.float32), (t, out_size, out_size, c),
        spatial_dims=(1, 2), scale=scale, translation=translation,
        method="linear", antialias=True)
    flipped = out[:, :, ::-1, :]
    if invert_x_on_flip is not None:
        # flow x-channels invert their pixel values when flipped
        # (reference utils/video_transforms.py:54-57)
        inv = jnp.where(invert_x_on_flip[None, None, None, :],
                        255.0 - flipped, flipped)
        flipped = inv
    out = jnp.where(flip, flipped, out)
    if mean is not None:
        out = out / 255.0
        out = (out - mean) / std
    return out


@functools.partial(
    jax.jit, static_argnames=("out_size", "mean", "std", "flow_channels",
                              "compute_dtype"))
def crop_resize_normalize(frames: jax.Array, crop_xywh: jax.Array,
                          flip: jax.Array, *, out_size: int,
                          mean: Optional[Sequence[float]],
                          std: Optional[Sequence[float]],
                          flow_channels: bool = False,
                          compute_dtype=jnp.float32) -> jax.Array:
    """Batched fused augmentation.

    frames:    (N, T, H, W, C) uint8 canvas (frames at top-left, zero pad)
    crop_xywh: (N, 4) float32 crop rectangles in source pixel coords
    flip:      (N,) bool
    mean/std:  per-channel tuples, or None to skip normalization
    flow_channels: True when C == 2 (x, y flow pair) -> invert x on flip
    returns    (N, T, out_size, out_size, C) compute_dtype
    """
    c = frames.shape[-1]
    mean_a = None if mean is None else jnp.asarray(mean, jnp.float32)
    std_a = None if std is None else jnp.asarray(std, jnp.float32)
    invert = None
    if flow_channels:
        invert = jnp.asarray([True] + [False] * (c - 1))
    fn = functools.partial(_one_sample, out_size=out_size, mean=mean_a,
                           std=std_a, invert_x_on_flip=invert)
    out = jax.vmap(fn)(frames, crop_xywh.astype(jnp.float32), flip)
    return out.astype(compute_dtype)


@jax.jit
def rgbdiff_from_frames(frames: jax.Array) -> jax.Array:
    """RGB-difference proxy frames on device (reference
    utils/video_dataset.py:32-38): diff = clip01((a - b + 255) * 255/510)
    quantized to uint8 exactly as the reference's astype(np.uint8).

    frames: (..., K, H, W, C) uint8, K consecutive frames
    returns (..., K-1, H, W, C) uint8 diffs (frame[i+1] - frame[i])
    """
    a = frames[..., 1:, :, :, :].astype(jnp.float32)
    b = frames[..., :-1, :, :, :].astype(jnp.float32)
    diff = (a - b + 255.0) * (255.0 / 510.0)
    # floor before the cast: XLA float->int converts round-to-nearest, but
    # the reference's numpy astype(np.uint8) truncates
    return jnp.floor(diff).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("size", "stride"))
def policy_stream(x: jax.Array, size: int = 160, stride: int = 2) -> jax.Array:
    """Build the lightweight policy-net input from the main-net visual stream
    (reference models/adamml.py:59-62): bilinear downsample to `size` and
    take every `stride`-th frame.

    x: (N, S, F, H, W, C) -> (N, S, ceil(F/stride), size, size, C)
    """
    n, s, f, h, w, c = x.shape
    sub = x[:, :, ::stride]
    fp = sub.shape[2]
    return jax.image.resize(sub, (n, s, fp, size, size, c), method="linear")
