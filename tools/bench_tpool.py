#!/usr/bin/env python3
"""Microbench: stage-boundary `bn-apply + residual-add + relu + temporal
max-pool` formulations on the flagship stage-1 shape.

The compiled policy-phase step spends ~12.4 ms/step (batch 8) in this
region: the producer fusion writes the block output z in a frames-as-
sublanes layout, reduce-window reads it at ~88 GB/s (6x below what plain
fusions achieve here), and a relayout follows (HLO: fusion.152 +
reduce-window.3 + reshape.516). Candidates:

  xla_rw      current: elementwise fusion -> lax.reduce_window
  xla_slice   concat of elementwise maxes over frame slices (no pad)
  pallas      one fused kernel: read y,identity once, write pooled once

Usage: python tools/bench_tpool.py [batch=8]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")


def _affine_relu_add(y, ident, a, b):
    z = y.astype(jnp.float32) * a + b
    return jax.nn.relu(z.astype(y.dtype) + ident)


def tpool_rw(y, ident, a, b):
    z = _affine_relu_add(y, ident, a, b)
    from adamml_tpu.ops.temporal import temporal_pool

    return temporal_pool(z, 3, 2, "max")


def tpool_slice(y, ident, a, b):
    z = _affine_relu_add(y, ident, a, b)
    f = z.shape[1]
    outs = []
    for fo in range((f + 1) // 2):
        lo, hi = max(0, 2 * fo - 1), min(f, 2 * fo + 2)
        outs.append(jnp.max(z[:, lo:hi], axis=1, keepdims=True))
    return jnp.concatenate(outs, axis=1)


def _pool_kernel(y_ref, id_ref, a_ref, b_ref, o_ref, *, f_in):
    y = y_ref[...].astype(jnp.float32)
    z = y * a_ref[...] + b_ref[...]
    z = jnp.maximum(z.astype(y_ref.dtype) + id_ref[...], 0)
    outs = []
    for fo in range((f_in + 1) // 2):
        lo, hi = max(0, 2 * fo - 1), min(f_in, 2 * fo + 2)
        outs.append(jnp.max(z[:, lo:hi], axis=1, keepdims=True))
    o_ref[...] = jnp.concatenate(outs, axis=1)


def tpool_pallas(y, ident, a, b):
    from jax.experimental import pallas as pl

    n, f, h, w, c = y.shape
    fo = (f + 1) // 2
    hb = 8 if h % 8 == 0 else h
    grid = (n, h // hb)
    blk = lambda i, j: (i, 0, j, 0, 0)
    return pl.pallas_call(
        functools.partial(_pool_kernel, f_in=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, hb, w, c), blk),
            pl.BlockSpec((1, f, hb, w, c), blk),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, fo, hb, w, c), blk),
        out_shape=jax.ShapeDtypeStruct((n, fo, h, w, c), y.dtype),
    )(y, ident, a, b)


def bench(fn, args, steps=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0, 0, 0, 0]))  # value fetch = reliable sync on relay

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = f(*args)
        float(jnp.sum(o[0, 0, 0, 0]))
        return time.perf_counter() - t0

    t_small = run(max(1, steps // 4))
    t_large = run(steps)
    return (t_large - t_small) / (steps - max(1, steps // 4))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shapes = [((batch * 5, 8, 56, 56, 256), "stage1"),
              ((batch * 5, 4, 28, 28, 512), "stage2"),
              ((batch * 5, 2, 14, 14, 1024), "stage3")]
    key = jax.random.PRNGKey(0)
    for shape, name in shapes:
        n, f, h, w, c = shape
        y = jax.random.normal(key, shape, jnp.bfloat16)
        ident = jax.random.normal(jax.random.fold_in(key, 1), shape,
                                  jnp.bfloat16)
        a = jnp.ones((c,), jnp.float32) * 0.9
        b = jnp.zeros((c,), jnp.float32) + 0.1
        gb = (2 * y.size + 2 * ident.size // f * ((f + 1) // 2)) / 1e9
        res = {}
        for label, fn in [("xla_rw", tpool_rw), ("xla_slice", tpool_slice),
                          ("pallas", tpool_pallas)]:
            try:
                ref = jax.jit(tpool_rw)(y, ident, a, b)
                got = jax.jit(fn)(y, ident, a, b)
                ok = bool(jnp.all(ref == got))
                dt = bench(fn, (y, ident, a, b))
                res[label] = (dt, ok)
                print(f"{name} {label:9s} {dt * 1e3:7.2f} ms  "
                      f"{gb / dt:6.0f} GB/s  exact={ok}", flush=True)
            except Exception as e:
                print(f"{name} {label:9s} FAILED: {type(e).__name__}: {e}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
