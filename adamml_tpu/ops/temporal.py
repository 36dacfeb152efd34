"""Temporal pooling over the frame axis.

The reference's only temporal-modeling op (reference models/common.py:4-33):
a 3D max/avg pool with kernel 3, stride 2, padding 1 applied over time. The
reference reshapes a frame-folded (N*F, C, H, W) tensor into 5-D to use
nn.MaxPool3d; here the frame axis is explicit and the pool is a single
lax.reduce_window -- no layout churn, XLA fuses it with neighbors.

Avg mode divides by the full kernel size including padded positions,
matching torch.nn.AvgPool3d's count_include_pad=True default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def temporal_pool(x: jax.Array, kernel: int = 3, stride: int = 2,
                  mode: str = "max") -> jax.Array:
    """Pool over axis 1 of (N, F, ..., C). Output frames =
    floor((F + 2*pad - kernel)/stride) + 1 with pad = (kernel-1)//stride."""
    pad = (kernel - 1) // stride
    ndim = x.ndim
    window = [1] * ndim
    strides = [1] * ndim
    padding = [(0, 0)] * ndim
    window[1] = kernel
    strides[1] = stride
    padding[1] = (pad, pad)
    if mode == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
        return lax.reduce_window(x, init, lax.max, window, strides, padding)
    elif mode == "avg":
        summed = lax.reduce_window(
            x.astype(jnp.float32), 0.0, lax.add, window, strides, padding)
        return (summed / float(kernel)).astype(x.dtype)
    raise ValueError("mode must be 'avg' or 'max'")
