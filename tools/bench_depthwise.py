#!/usr/bin/env python3
"""TPU micro-benchmark + numeric check for the fused Pallas depthwise kernel
(adamml_tpu/ops/pallas/depthwise.py) against XLA's depthwise conv."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from adamml_tpu.ops.pallas.depthwise import (_pallas_dw, _xla_dw,
                                             pallas_depthwise_available)


def timeit(f, iters=15, warm=2):
    for i in range(warm):
        o = f(i)
    jax.device_get(o.ravel()[0])

    def run(k, b):
        t0 = time.perf_counter()
        for i in range(k):
            o = f(b + i)
        jax.device_get(o.ravel()[0])
        return time.perf_counter() - t0

    return (run(iters, 200) - run(3, 100)) / (iters - 3)


def main():
    shapes = [(80, 80, 80, 96), (80, 40, 40, 144), (80, 20, 20, 384),
              (80, 10, 10, 960)]
    for (b, h, w, c) in shapes:
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(np.random.default_rng(1).normal(
            size=(3, 3, c)).astype(np.float32)).astype(jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32)
        z = jnp.zeros((c,), jnp.float32)
        if not pallas_depthwise_available(x.shape):
            print(f"{b}x{h}x{w}x{c}: pallas unavailable for this shape")
            continue
        pal = jax.jit(lambda x, k: _pallas_dw(x, k, s, z, 1, True))
        ref = jax.jit(lambda x, k: _xla_dw(x, k, s, z, 1, True))
        got = np.asarray(pal(x, k), np.float32)
        want = np.asarray(ref(x, k), np.float32)
        err = np.abs(got - want).max()
        tp = timeit(lambda i, x=x, k=k: pal(x + jnp.bfloat16(i * 1e-3), k))
        tx = timeit(lambda i, x=x, k=k: ref(x + jnp.bfloat16(i * 1e-3), k))
        by = (x.size * 2 * 2 + k.size * 2)
        print(f"{b}x{h}x{w}x{c}: pallas {tp*1e3:.2f} ms "
              f"({by/tp/1e9:.0f} GB/s) vs xla {tx*1e3:.2f} ms "
              f"({by/tx/1e9:.0f} GB/s) -> {tx/tp:.2f}x, maxerr {err:.4f}")


if __name__ == "__main__":
    main()
