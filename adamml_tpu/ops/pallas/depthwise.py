"""Pallas TPU kernel: fused 3x3 depthwise conv (+ BN affine + ReLU6).

Why: the MobileNetV2 trunks (policy net + audio backbone) are depthwise-
dominated, and XLA's depthwise conv runs far below the HBM roofline on the
shapes this model hits (measured ~67 GB/s effective on (80, 80, 80, 96) vs
~819 GB/s peak on v5e). A depthwise conv is bandwidth-bound: each image
block needs exactly one HBM->VMEM load, nine shifted VPU multiply-adds, and
one store. This kernel does that, and folds the batch-norm affine and ReLU6
of the surrounding MobileNetV2 block (reference
models/sound_mobilenet_v2.py:33-40) into the same pass so the activation
never makes a second HBM round trip.

Kernel shape: grid over the batch axis; the whole spatially-padded image
(H+2, W+2, C) lives in VMEM per program (<= ~7 MB for every MobileNetV2
shape at 224*2 inputs). Stride 1 and 2 supported; SAME padding.

Backward: custom VJP. dx for stride 1 is the same kernel with a spatially
flipped filter (self-adjoint); the filter gradient is a tiny 9-tap
reduction done in XLA. Stride-2 backward falls back to XLA's transposed
conv (only 3 of 17 MobileNetV2 blocks are stride 2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only at runtime; import guarded for CPU test envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# VMEM budget guard: (H+2)*(W+2)*C(padded to 128 lanes)*2B must fit
_VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def pallas_depthwise_available(shape=None) -> bool:
    """TPU-only, and only on shapes where the kernel beats XLA (measured:
    wins on large-spatial blocks where XLA's depthwise runs ~60 GB/s; loses
    on small-spatial/lane-padded blocks, so those dispatch to XLA)."""
    if not _PALLAS_OK:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    if shape is not None:
        _, h, w, c = shape
        c_pad = max(128, ((c + 127) // 128) * 128)
        in_bytes = (h + 2) * (w + 2) * c_pad * 2
        out_bytes = h * w * c_pad * 2
        # in/out blocks are double-buffered by the pipeline; leave ~3 MB for
        # the f32 row-tile accumulator and window temporaries
        if 2 * (in_bytes + out_bytes) + 3 * 2**20 > _VMEM_LIMIT_BYTES:
            return False
        if h * w < 2500:  # small-spatial: XLA is faster (measured)
            return False
    return True


def _row_tile(oh: int, budget_rows: int = 16) -> int:
    """Largest divisor of oh that is <= budget_rows (keeps the f32
    accumulator + window temps inside the scoped-VMEM budget)."""
    for th in range(min(budget_rows, oh), 0, -1):
        if oh % th == 0:
            return th
    return 1


def _dw_kernel(x_ref, w_ref, s_ref, b_ref, out_ref, *, stride: int,
               relu6: bool, oh: int, ow: int):
    """x_ref: (1, Hp, Wp, C); w_ref: (9, C) taps row-major; s/b_ref: (1, C);
    out_ref: (1, OH, OW, C). Output rows are produced in static tiles so the
    f32 accumulator and per-window temporaries stay small; the input block
    loads once in its native dtype."""
    c = x_ref.shape[-1]
    x = x_ref[0]  # (Hp, Wp, C) in input dtype
    scale = s_ref[0].astype(jnp.float32)[None, None, :]
    bias = b_ref[0].astype(jnp.float32)[None, None, :]
    th = _row_tile(oh)
    for t in range(oh // th):
        acc = jnp.zeros((th, ow, c), jnp.float32)
        row0 = t * th * stride
        for dy in range(3):
            for dx in range(3):
                if stride == 1:
                    win = x[row0 + dy:row0 + dy + th, dx:dx + ow, :]
                else:
                    win = x[row0 + dy:row0 + dy + 2 * th:2,
                            dx:dx + 2 * ow:2, :]
                tap = w_ref[3 * dy + dx, :].astype(jnp.float32)
                acc = acc + win.astype(jnp.float32) * tap[None, None, :]
        acc = acc * scale + bias
        if relu6:
            acc = jnp.clip(acc, 0.0, 6.0)
        out_ref[0, t * th:(t + 1) * th] = acc.astype(out_ref.dtype)


def _same_pads(size: int, stride: int, k: int = 3):
    """XLA 'SAME' convention: total = max(0, (out-1)*stride + k - size),
    lo = total // 2 (asymmetric for stride 2 on even sizes)."""
    out = (size + stride - 1) // stride
    total = max(0, (out - 1) * stride + k - size)
    lo = total // 2
    return out, lo, total - lo


def _pallas_dw(x, w, scale, bias, stride: int, relu6: bool):
    """x: (B, H, W, C); w: (3, 3, C); scale/bias: (C,)."""
    b, h, wd, c = x.shape
    oh, ph_lo, ph_hi = _same_pads(h, stride)
    ow, pw_lo, pw_hi = _same_pads(wd, stride)
    # the kernel slices x[dy : dy + stride*oh : stride]; make sure the
    # padded buffer covers dy = 2 at full stride
    ph_hi = max(ph_hi, (oh - 1) * stride + 3 - h - ph_lo)
    pw_hi = max(pw_hi, (ow - 1) * stride + 3 - wd - pw_lo)
    xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]

    kernel = functools.partial(_dw_kernel, stride=stride, relu6=relu6,
                               oh=oh, ow=ow)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
    )(xp, w.reshape(9, c), scale.reshape(1, c), bias.reshape(1, c))


def _xla_dw(x, w, scale, bias, stride: int, relu6: bool):
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if relu6:
        out = jnp.clip(out, 0.0, 6.0)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _dw_fused(x, w, scale, bias, stride: int, relu6: bool,
              has_affine: bool):
    if stride == 1 and pallas_depthwise_available(x.shape):
        return _pallas_dw(x, w, scale, bias, stride, relu6)
    return _xla_dw(x, w, scale, bias, stride, relu6)


def _dw_fwd(x, w, scale, bias, stride, relu6, has_affine):
    out = _dw_fused(x, w, scale, bias, stride, relu6, has_affine)
    return out, (x, w, scale, bias, out)


def _dw_bwd(stride, relu6, has_affine, res, g):
    x, w, scale, bias, out = res
    g = g.astype(jnp.float32)
    if relu6:
        # d relu6: pass-through on (0, 6)
        outf = out.astype(jnp.float32)
        g = g * ((outf > 0.0) & (outf < 6.0)).astype(jnp.float32)
    if has_affine:
        dscale = jnp.einsum("bhwc,bhwc->c", g,
                            _conv_only(x, w, stride).astype(jnp.float32))
        dbias = jnp.sum(g, axis=(0, 1, 2))
        gc = g * scale.astype(jnp.float32)
    else:
        dscale = jnp.zeros_like(scale)
        dbias = jnp.zeros_like(bias)
        gc = g

    c = x.shape[-1]
    # input gradient: for stride 1 the adjoint is the same depthwise conv
    # with spatially flipped taps -> reuse the Pallas kernel; otherwise XLA
    if stride == 1 and pallas_depthwise_available(gc.shape):
        dx = _pallas_dw(gc.astype(x.dtype), w[::-1, ::-1, :],
                        jnp.ones((c,), jnp.float32),
                        jnp.zeros((c,), jnp.float32), 1, False)
    else:
        wf32 = w.astype(jnp.float32)
        _, vjp_x = jax.vjp(
            lambda xv: _conv_only(xv, wf32, stride), x.astype(jnp.float32))
        (dx,) = vjp_x(gc)
        dx = dx.astype(x.dtype)
    # filter gradient: XLA's optimized filter-grad conv
    _, vjp_w = jax.vjp(
        lambda wv: _conv_only(x.astype(jnp.float32), wv, stride),
        w.astype(jnp.float32))
    (dw,) = vjp_w(gc)
    return (dx, dw.astype(w.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


_dw_fused.defvjp(_dw_fwd, _dw_bwd)


def _conv_only(x, w, stride):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32)


def depthwise_conv3x3(x: jax.Array, w: jax.Array, *, stride: int = 1,
                      scale: Optional[jax.Array] = None,
                      bias: Optional[jax.Array] = None,
                      relu6: bool = False) -> jax.Array:
    """Fused depthwise 3x3 conv + per-channel affine + optional ReLU6.

    x: (B, H, W, C); w: (3, 3, C) per-channel taps; scale/bias: (C,) (the
    folded inference-or-training BN affine; identity when None).
    """
    c = x.shape[-1]
    has_affine = scale is not None or bias is not None
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    return _dw_fused(x, w, scale, bias, stride, relu6, has_affine)
