#!/usr/bin/env python3
"""Microbenchmark: optimizer-update cost, per-tensor optax vs fused vector.

Round-1 bisection (BENCH.md) found the flagship step spends ~24 ms applying
optimizer updates -- ~10x the bandwidth bound for 60M params. Hypothesis:
per-tensor overhead (hundreds of tiny elementwise kernels). This times
update-only jitted functions over the REAL flagship parameter trees:

  sgd/optax    per-tensor torch-SGD (momentum) over main_net
  sgd/fused    raveled-vector FusedSGD over main_net
  adam/optax   per-tensor torch-Adam over policy_net
  adam/fused   raveled-vector FusedAdam over policy_net

Protocol identical to bench.py: per-step varying inputs, value-fetch sync,
marginal time between short and long runs.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def time_fn(fn, state0, grads, steps=30):
    # vary the grads INSIDE the jitted fn via a scalar (one input buffer per
    # step); perturbing the tree host-side would dispatch one kernel per
    # tensor through the relay and dwarf the thing being measured
    def run(n, st, key0):
        for i in range(n):
            st = fn(st, grads, jnp.float32(1.0 + 1e-6 * (key0 + i)))
        float(jax.device_get(jax.tree_util.tree_leaves(st)[0].ravel()[0]))
        return st

    st = run(2, state0, 0)  # compile
    t0 = time.perf_counter()
    st = run(steps // 3, st, 100)
    t1 = time.perf_counter()
    st = run(steps, st, 200)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (steps - steps // 3)


def main():
    from __graft_entry__ import _flagship_cfg
    from adamml_tpu.models.model_builder import (build_model, example_inputs,
                                                 init_model)
    from adamml_tpu.train.optim import (FusedAdam, FusedSGD, adam_transform,
                                        sgd_transform)

    cfg = _flagship_cfg()
    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    inputs = example_inputs(cfg, batch=2, num_segments=5, rng=rng)
    variables = init_model(model, cfg, inputs, rng, train=True)
    params = variables["params"]

    def n_params(tree):
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))

    results = {}
    for name, subtree, makers in [
        ("sgd", params["main_net"], [
            ("optax", sgd_transform(0.9, False, 1e-4)),
            ("fused", FusedSGD(0.9, False, 1e-4))]),
        ("adam", params["policy_net"], [
            ("optax", adam_transform(1e-4)),
            ("fused", FusedAdam(1e-4))]),
    ]:
        grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-3,
                                       subtree)
        tensors = len(jax.tree_util.tree_leaves(subtree))
        for kind, tx in makers:
            if hasattr(tx, "apply"):
                @jax.jit
                def fn(st, g, scale, tx=tx):
                    g = jax.tree_util.tree_map(lambda x: x * scale, g)
                    p, s = tx.apply(g, st["s"], st["p"], 0.01)
                    return {"p": p, "s": s}
            else:
                @jax.jit
                def fn(st, g, scale, tx=tx):
                    g = jax.tree_util.tree_map(lambda x: x * scale, g)
                    u, s = tx.update(g, st["s"], st["p"])
                    p = jax.tree_util.tree_map(
                        lambda a, b: a - 0.01 * b, st["p"], u)
                    return {"p": p, "s": s}
            st0 = {"p": subtree, "s": tx.init(subtree)}
            dt = time_fn(fn, st0, grads)
            results[f"{name}/{kind}"] = dt
            print(f"{name}/{kind}: {dt * 1000:.2f} ms  "
                  f"({n_params(subtree) / 1e6:.1f}M params, "
                  f"{tensors} tensors)", flush=True)

    # pure single-vector updates (no ravel/unravel, no tree): isolates the
    # achievable streaming cost from the tree<->vector conversion overhead
    # that the Fused* paths pay every step
    for name, n in (("sgd", n_params(params["main_net"])),
                    ("adam", n_params(params["policy_net"]))):
        vec = jnp.zeros((n,), jnp.float32)
        gvec = jnp.full((n,), 1e-3, jnp.float32)
        if name == "sgd":
            st0 = {"p": vec, "s": {"trace": vec}}

            @jax.jit
            def fn(st, g, scale):
                g = g * scale + 1e-4 * st["p"]
                v = 0.9 * st["s"]["trace"] + g
                return {"p": st["p"] - 0.01 * v, "s": {"trace": v}}
        else:
            st0 = {"p": vec, "s": {"mu": vec, "nu": vec,
                                   "count": jnp.zeros((), jnp.int32)}}

            @jax.jit
            def fn(st, g, scale):
                g = g * scale + 1e-4 * st["p"]
                count = st["s"]["count"] + 1
                mu = 0.9 * st["s"]["mu"] + 0.1 * g
                nu = 0.999 * st["s"]["nu"] + 0.001 * jnp.square(g)
                t = count.astype(jnp.float32)
                upd = (mu / (1.0 - 0.9 ** t)) / (
                    jnp.sqrt(nu / (1.0 - 0.999 ** t)) + 1e-8)
                return {"p": st["p"] - 0.01 * upd,
                        "s": {"mu": mu, "nu": nu, "count": count}}
        dt = time_fn(fn, st0, gvec)
        results[f"{name}/vector"] = dt
        print(f"{name}/vector: {dt * 1000:.2f} ms  ({n / 1e6:.1f}M params, "
              f"pure vector, no ravel)", flush=True)

    for opt in ("sgd", "adam"):
        a, b = results[f"{opt}/optax"], results[f"{opt}/fused"]
        print(f"{opt}: fused is {a / max(b, 1e-9):.2f}x vs per-tensor; "
              f"pure vector {a / max(results[f'{opt}/vector'], 1e-9):.2f}x")


if __name__ == "__main__":
    main()
