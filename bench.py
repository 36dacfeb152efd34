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

Record semantics (round 5): the default path measures EVERY rung in
CANDIDATES and records the max (plus a fixed-cost hardware canary for
cross-window normalization); the FLOOR rung runs only if every candidate
failed. Round 4's first-success ladder structurally capped the record at
its first rung (VERDICT r4 weak #1).
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

# Measurement rungs (round 5, VERDICT r4 task 1): the DEFAULT path runs
# EVERY rung and records the max, because the relay's memory slice VARIES
# across windows -- round 2 fit batch 24 (128.0 clips/s), the round-4 window
# OOMed batch 24 even with stage-1 remat while 16 ran reliably at ~121. The
# round-4 first-success ladder could therefore never try 24 on a window
# where it would win (it was only reached when 16 FAILED, i.e. on slices
# where 24 fails too), hard-capping the record at batch-16 throughput.
# Subprocess isolation makes the extra attempt risk-free: an OOM at 24 dies
# with its child and the 16 record stands. FLOOR is tried only if every
# rung fails, so a tiny slice still produces a (degraded) record.
# Round-5 same-window A/B (BENCH.md): at batch 16 the policy-trunk remat
# recompute costs 13.8 ms/step (131.5 -> 117.7 ms, 121.7 -> 135.9 clips/s)
# and the memory it frees is not needed at this batch, so the 16 rung runs
# with ADAMML_NO_REMAT_POLICY=1. The 24 rung keeps remat ON -- it is the
# memory-starved rung (OOMs on r4/r5-sized slices even WITH remat; fits on
# r2-sized ones). FLOOR walks first-success: 16-with-remat (the proven-safe
# config if no-remat OOMs on a smaller slice), then 8.
CANDIDATES = [
    (16, {"ADAMML_NO_REMAT_POLICY": "1"}),
    (24, {}),
]
FLOOR = [
    (16, {}),
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
    # ADAMML_PHASE=main benches the main-phase step (policy frozen, main-net
    # SGD) instead of the default policy-phase step. The alternating
    # curriculum stage runs one main-phase epoch per policy epoch (reference
    # train_adamml.py:410-451), so training-run-level throughput needs both
    # numbers. Measured round 5 (BENCH.md): the MAIN phase is the expensive
    # one (235 ms vs 131.5 ms at batch 16 -- it computes every conv weight
    # gradient + the SGD update, while the policy phase's frozen-main filter
    # grads are DCE'd). The RECORD metric stays the policy-phase step for
    # cross-round comparability (it has been the metric since round 1).
    phase = os.environ.get("ADAMML_PHASE", "policy")
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
    if os.environ.get("ADAMML_REMAT_POLICY") == "1":
        cfg.model.remat_policy = True
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

    flags = (StageFlags.main_phase() if phase == "main"
             else StageFlags.policy_phase())
    common = dict(flags=flags, penalty_type="blockdrop",
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
    metric = ("adamml_train_clips_per_sec_per_chip" if phase != "main"
              else "adamml_train_main_phase_clips_per_sec_per_chip")
    result = {
        "metric": metric,
        "value": round(videos_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(videos_per_sec / BASELINE_VIDEOS_PER_SEC, 3),
        "batch": batch,
    }
    print(f"# phase={phase} batch={batch} steps={steps} spd={spd} "
          f"dispatch_time={dt * 1000:.1f}ms "
          f"(T({small})={t_small:.2f}s T({steps})={t_large:.2f}s) "
          f"modeled-MFU~{mfu * 100:.1f}% "
          f"baseline_est={BASELINE_VIDEOS_PER_SEC:.1f} clips/s (V100 fp32 "
          f"@40% MFU on the reference's own FLOPs model)", file=sys.stderr)
    return result


def canary_measure() -> dict:
    """Fixed-cost hardware canary (VERDICT r4 weak #6): a bf16 matmul chain
    (MXU rate) and an f32 elementwise chain (HBM rate), identical every
    round, so BENCH_r0N records are normalizable across relay windows --
    without it, "code got faster" and "slice got better" are
    indistinguishable on the record. ~30 s including compiles (small jitted
    fns DO persist in the compilation cache, unlike the flagship step)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    plat = os.environ.get("ADAMML_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/adamml_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    key = jax.random.PRNGKey(0)
    # size overrides exist ONLY so tests can run the canary on CPU; the
    # recorded canary always uses the fixed defaults
    N = int(os.environ.get("ADAMML_CANARY_N", "2048"))
    K = int(os.environ.get("ADAMML_CANARY_K", "32"))
    b = jax.random.normal(key, (N, N)).astype(jnp.bfloat16)

    @jax.jit
    def mm_chain(a):
        # K chained NxN bf16 matmuls; the renorm (O(N^2)) keeps values
        # bounded and is negligible vs the matmul (O(N^3))
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.float32)
            return (y / (jnp.max(jnp.abs(y)) + 1e-6)).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, a, None, length=K)
        return x

    # 32M f32 = 128 MiB; per iter: 1 read + 1 write
    M = int(os.environ.get("ADAMML_CANARY_M", str(32 * 1024 * 1024)))

    @jax.jit
    def bw_chain(x):
        def body(x, _):
            return x * 1.000001 + 1e-7, ()
        x, _ = jax.lax.scan(body, x, None, length=K)
        return x

    def marginal(fn, x0, n_small=2, n_large=8):
        x = fn(x0)
        float(jax.device_get(x.ravel()[0]))  # compile + warm

        def run(n, x):
            t0 = _time.perf_counter()
            for _ in range(n):
                x = fn(x)
            float(jax.device_get(x.ravel()[0]))  # drains the queue
            return _time.perf_counter() - t0, x

        t_small, x = run(n_small, x)
        t_large, _ = run(n_large, x)
        return max(1e-9, (t_large - t_small) / (n_large - n_small))

    a0 = jax.random.normal(jax.random.fold_in(key, 1),
                           (N, N)).astype(jnp.bfloat16)
    t_mm = marginal(mm_chain, a0) / K  # sec per NxN matmul
    t_bw = marginal(bw_chain, jnp.zeros((M,), jnp.float32)) / K
    return {
        "canary_matmul_tflops": round(2.0 * N ** 3 / t_mm / 1e12, 1),
        "canary_bw_gbps": round(2.0 * M * 4 / t_bw / 1e9, 1),
    }


def _run_canary(timeout: int = 900) -> dict:
    """Run the canary in its own subprocess (same isolation as measurement
    children). Returns {} on any failure -- the canary must never cost the
    throughput record."""
    cmd = [sys.executable, os.path.join(_REPO_DIR, "bench.py"), "--canary"]
    try:
        proc = subprocess.run(cmd, cwd=_REPO_DIR, env=dict(os.environ),
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"# canary TIMEOUT after {timeout}s; omitting", file=sys.stderr)
        return {}
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
        print(f"# canary rc={proc.returncode}; omitting. tail:",
              file=sys.stderr)
        for ln in tail:
            print(f"#   {ln}", file=sys.stderr)
        return {}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
                print(f"# canary: {out}", file=sys.stderr)
                return out
            except json.JSONDecodeError:
                break
    print("# canary produced no JSON line; omitting", file=sys.stderr)
    return {}


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
    if proc.returncode != 0:
        # full stderr tail only on FAILURE (ADVICE r4): a clean run's log
        # should not be polluted with the child's compile chatter
        sys.stderr.write(proc.stderr[-4000:])
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
        print(f"# child batch={batch} env={env_extra} rc={proc.returncode}; "
              "degrading. tail:", file=sys.stderr)
        for ln in tail:
            print(f"#   {ln}", file=sys.stderr)
        return None
    # on success, forward only the child's intentional protocol lines
    # (the `# phase=... dispatch_time=...` rows BENCH.md cites)
    for ln in proc.stderr.splitlines():
        if ln.startswith("# "):
            print(ln, file=sys.stderr)
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
    if argv and argv[0] == "--canary":
        print(json.dumps(canary_measure()))
        return 0
    if argv and argv[0] == "--sweep":
        # sweep = the default record path PLUS a main-phase measurement at
        # the winning batch, so BENCH.md can cite a curriculum-weighted
        # clips/s (the alternating stage runs one main-phase epoch per
        # policy epoch -- equal clip counts, so the weighted rate is the
        # harmonic mean of the two phase rates).
        canary = _run_canary()
        best = run_candidates(CANDIDATES + FLOOR,
                              lambda b, e: _run_child(b, 20, e),
                              best_of_all=True)
        if best is None:
            print("# all sweep candidates failed", file=sys.stderr)
            return 1
        main_r = _run_child(int(best.get("batch", CANDIDATES[0][0])), 20,
                            {"ADAMML_PHASE": "main"})
        if main_r is not None:
            v_pol, v_main = best["value"], main_r["value"]
            weighted = 2.0 / (1.0 / v_pol + 1.0 / v_main)
            best["main_phase_value"] = round(v_main, 3)
            best["curriculum_weighted_value"] = round(weighted, 3)
            print(f"# main-phase {v_main:.1f} clips/s, policy-phase "
                  f"{v_pol:.1f} clips/s -> curriculum-weighted "
                  f"{weighted:.1f} clips/s (alternating 1:1 epoch mix)",
                  file=sys.stderr)
        best.update(canary)
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
    # Default (the exact command the driver runs): canary, then EVERY rung,
    # max wins (VERDICT r4 task 1 -- first-success could never beat its
    # first rung); FLOOR only if every rung's child failed.
    canary = _run_canary()
    r = run_candidates(CANDIDATES, lambda b, e: _run_child(b, 20, e),
                       best_of_all=True)
    if r is None:
        r = run_candidates(FLOOR, lambda b, e: _run_child(b, 20, e))
    if r is None:
        print("# every candidate failed -- no throughput record",
              file=sys.stderr)
        return 1
    r.update(canary)
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
