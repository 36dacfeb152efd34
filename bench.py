#!/usr/bin/env python3
"""Benchmark: AdaMML flagship training throughput on one TPU chip.

Measures clips(videos)/sec/chip for the canonical AdaMML RGB+sound training
step (reference README.md:86-95: ResNet-50 TSN + MobileNetV2 audio, 5
segments x 8 frames, LSTM policy, blockdrop loss, both optimizers) on
synthetic device-resident inputs -- the same step the curriculum driver runs.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
the comparison point is modeled from its own analytic cost table
(reference utils/utils.py:510-535): 76.39 GFLOPs/video forward at 100%
selection, x3 for fwd+bwd, executed in fp32 on a V100 (15.7 TFLOP/s peak)
at a generous 40% MFU -> 27.4 videos/sec/chip. vs_baseline is measured
throughput divided by that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Process model (round 4): the PARENT process never imports jax. Every
measurement attempt runs in a CHILD subprocess (`bench.py --child ...`), so
a RESOURCE_EXHAUSTED at one batch size dies with its process -- its device
buffers, caches, and exception tracebacks cannot poison the next attempt.
This replaces the round-3 in-process degradation ladder, whose saved
exception traceback pinned the failed attempt's multi-GB buffers alive and
turned one OOM into rc=1 for the whole bench (VERDICT r3 weak #1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# reference cost model: GFLOPs/video fwd at full selection (BASELINE.md)
REF_FWD_GFLOPS = 76.39
REF_PEAK_TFLOPS_FP32 = 15.7  # V100
REF_MFU = 0.40
BASELINE_VIDEOS_PER_SEC = (REF_PEAK_TFLOPS_FP32 * 1e12 * REF_MFU) / (
    REF_FWD_GFLOPS * 1e9 * 3.0)

V5E_PEAK_TFLOPS_BF16 = 197.0

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))

# Attempt ladder, best-first: each entry is (batch, extra env). Ordered by
# the round-4 sweep on the real chip (BENCH.md): the relay's memory slice
# VARIES across days -- round 2 fit batch 24 (128.0 clips/s), the round-4
# window OOMed batch 24 even with stage-1 remat while 16 ran reliably at
# ~121. Flagship-step compiles on the relay are ~15-25 min and do NOT
# persist in the compile cache, so a first rung that fits matters more than
# a speculative bigger batch: 16 first (measured best that always fit),
# 24 as the fallback rung for larger slices, 8 as the floor. The parent
# walks down on any child failure, so the record degrades instead of dying.
CANDIDATES = [
    (16, {}),
    (24, {}),
    (8, {}),
]


def measure(batch: int, steps: int, tiny: bool = False) -> dict:
    """One in-process measurement. jax is imported HERE, not at module
    scope, so the parent process stays backend-free."""
    import jax
    import jax.numpy as jnp

    # test hook: the axon sitecustomize re-asserts JAX_PLATFORMS=axon at
    # interpreter start, so CPU-backed bench children (tests/test_bench.py)
    # must override via jax.config before the backend is touched -- the same
    # dance as tests/conftest.py
    plat = os.environ.get("ADAMML_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # persistent compilation cache: flagship-step compiles take minutes on
    # the relay; cache hits make re-benches (and sweep re-runs) near-instant
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/adamml_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    fake_oom = os.environ.get("ADAMML_BENCH_FAKE_OOM", "")
    if fake_oom and batch in {int(b) for b in fake_oom.split(",") if b}:
        raise RuntimeError(
            f"RESOURCE_EXHAUSTED: injected test OOM at batch {batch}")

    from __graft_entry__ import _flagship_cfg
    from adamml_tpu.models.model_builder import (build_model, example_inputs,
                                                 init_model)
    from adamml_tpu.train.optim import build_optimizer
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    cfg = _flagship_cfg(tiny=tiny)
    num_segments = cfg.model.num_segments
    # A/B knobs for perf experiments (BENCH.md): ADAMML_FUSED=0 forces
    # per-tensor optax updates; ADAMML_SPD=K benches the K-step scanned
    # dispatch (steps.make_adamml_multi_step)
    if os.environ.get("ADAMML_FUSED") == "0":
        cfg.optim.fused_update = False
    if os.environ.get("ADAMML_REMAT") == "1":
        cfg.model.remat_backbone = True
    if os.environ.get("ADAMML_REMAT_STAGES"):
        cfg.model.remat_stages = tuple(
            int(s) for s in os.environ["ADAMML_REMAT_STAGES"].split(","))
    if os.environ.get("ADAMML_NO_REMAT_POLICY") == "1":
        cfg.model.remat_policy = False
    if os.environ.get("ADAMML_NO_FUSED_TPOOL") == "1":
        cfg.model.fused_tpool = False
    spd = int(os.environ.get("ADAMML_SPD", "1"))
    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    inputs = example_inputs(cfg, batch=batch, num_segments=num_segments,
                            rng=rng)
    inputs = [x.astype(jnp.bfloat16) for x in inputs]
    variables = init_model(model, cfg, inputs, rng, train=True)
    params = dict(variables["params"])
    tx_main = build_optimizer("main", cfg.optim)
    tx_policy = build_optimizer("policy", cfg.optim)
    state = AdaMMLTrainState.create(
        params, variables.get("batch_stats", {}),
        tx_main.init(params["main_net"]), tx_policy.init(params["policy_net"]))

    # benchmark the policy-phase step: it is the most expensive (both loss
    # terms, grads through policy AND main graphs)
    common = dict(flags=StageFlags.policy_phase(), penalty_type="blockdrop",
                  gammas=10.0, clip_gradient=None, has_policy_params=True)
    target = jnp.zeros((batch,), jnp.int32)
    lr = jnp.asarray(1e-3)
    p_lr = jnp.asarray(1e-2)
    cw = jnp.asarray([1.0, 0.05])

    if spd > 1:
        from adamml_tpu.train.steps import make_adamml_multi_step

        multi = make_adamml_multi_step(model, tx_main, tx_policy, **common)
        st_inputs = [jnp.stack([x] * spd) for x in inputs]
        st_target = jnp.stack([target] * spd)

        def step(st, _i, _t, lr, p_lr, cw, r):
            st, ms = multi(st, st_inputs, st_target, lr, p_lr, cw, r)
            return st, {"loss": ms["loss"][-1]}
    else:
        step = make_adamml_train_step(model, tx_main, tx_policy, **common)

    # warmup / compile; a VALUE FETCH is the only reliable sync on the axon
    # relay (block_until_ready returns before execution completes there)
    state, metrics = step(state, inputs, target, lr, p_lr, cw, rng)
    float(jax.device_get(metrics["loss"]))

    def run(n_steps, key0, st):
        t0 = time.perf_counter()
        m = None
        for i in range(n_steps):
            st, m = step(st, inputs, target, lr, p_lr, cw,
                         jax.random.fold_in(rng, key0 + i))
        float(jax.device_get(m["loss"]))  # drains the queue
        return time.perf_counter() - t0, st

    # marginal per-step time: (T(large) - T(small)) / (large - small)
    # cancels the fixed dispatch+fetch round-trip of the tunnel
    small = max(1, steps // 4)
    t_small, state = run(small, 1000, state)
    t_large, state = run(steps, 2000, state)
    dt = max(1e-9, (t_large - t_small) / max(1, steps - small))

    videos_per_sec = (batch * spd) / dt  # spd real steps per dispatch
    train_flops_per_video = REF_FWD_GFLOPS * 1e9 * 3.0
    mfu = (videos_per_sec * train_flops_per_video) / (
        V5E_PEAK_TFLOPS_BF16 * 1e12)
    result = {
        "metric": "adamml_train_clips_per_sec_per_chip",
        "value": round(videos_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(videos_per_sec / BASELINE_VIDEOS_PER_SEC, 3),
    }
    print(f"# batch={batch} steps={steps} spd={spd} "
          f"dispatch_time={dt * 1000:.1f}ms "
          f"(T({small})={t_small:.2f}s T({steps})={t_large:.2f}s) "
          f"modeled-MFU~{mfu * 100:.1f}% "
          f"baseline_est={BASELINE_VIDEOS_PER_SEC:.1f} clips/s (V100 fp32 "
          f"@40% MFU on the reference's own FLOPs model)", file=sys.stderr)
    return result


def _run_child(batch: int, steps: int, env_extra: dict,
               tiny: bool = False, timeout: int = 3600):
    """Run one measurement attempt in a fresh subprocess. Returns the parsed
    JSON result dict, or None on any child failure (the child's stderr/tail
    is echoed so the failure is visible in the bench log)."""
    cmd = [sys.executable, os.path.join(_REPO_DIR, "bench.py"), "--child",
           str(batch), str(steps)]
    if tiny:
        cmd.append("--tiny")
    env = dict(os.environ)
    env.update(env_extra)
    try:
        proc = subprocess.run(cmd, cwd=_REPO_DIR, env=env,
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"# child batch={batch} TIMEOUT after {timeout}s; degrading",
              file=sys.stderr)
        return None
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
        print(f"# child batch={batch} env={env_extra} rc={proc.returncode}; "
              "degrading. tail:", file=sys.stderr)
        for ln in tail:
            print(f"#   {ln}", file=sys.stderr)
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    print(f"# child batch={batch} produced no JSON line; degrading",
          file=sys.stderr)
    return None


def run_candidates(candidates, runner, best_of_all: bool = False):
    """Walk the attempt ladder. runner(batch, env) -> result dict or None.
    Default: first success wins (ladder is ordered best-first). With
    best_of_all, every candidate runs and the highest value wins."""
    best = None
    for batch, env_extra in candidates:
        r = runner(batch, env_extra)
        if r is None:
            continue
        if not best_of_all:
            return r
        if best is None or r.get("value", 0) > best.get("value", 0):
            best = r
    return best


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        batch = int(argv[1])
        steps = int(argv[2]) if len(argv) > 2 and argv[2].isdigit() else 20
        tiny = "--tiny" in argv
        print(json.dumps(measure(batch, steps, tiny=tiny)))
        return 0
    if argv and argv[0] == "--sweep":
        best = run_candidates(CANDIDATES,
                              lambda b, e: _run_child(b, 20, e),
                              best_of_all=True)
        if best is None:
            print("# all sweep candidates failed", file=sys.stderr)
            return 1
        print(json.dumps(best))
        return 0
    if argv:
        # `bench.py <batch> [steps]`: one config, still subprocess-isolated
        batch = int(argv[0])
        steps = int(argv[1]) if len(argv) > 1 else 20
        r = _run_child(batch, steps, {})
        if r is None:
            return 1
        print(json.dumps(r))
        return 0
    # Default: walk the measured-best ladder; first success is the record.
    r = run_candidates(CANDIDATES, lambda b, e: _run_child(b, 20, e))
    if r is None:
        print("# every candidate failed -- no throughput record",
              file=sys.stderr)
        return 1
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
