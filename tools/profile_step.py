#!/usr/bin/env python3
"""Capture a jax.profiler trace of the flagship train step and summarize.

Usage: python tools/profile_step.py [batch=8] [outdir=/tmp/adamml_trace]
Prints the top ops by total self-duration from the captured trace so the
bench's non-matmul time sinks are identifiable without TensorBoard.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adamml_trace"

    from __graft_entry__ import _flagship_cfg
    from adamml_tpu.models.model_builder import (build_model, example_inputs,
                                                 init_model)
    from adamml_tpu.train.optim import build_optimizer
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    cfg = _flagship_cfg()
    # honor bench.py's A/B env knobs so the profile can target the exact
    # record config (e.g. the 16 rung runs ADAMML_NO_REMAT_POLICY=1)
    import os
    if os.environ.get("ADAMML_NO_FUSED_TPOOL") == "1":
        cfg.model.fused_tpool = False
    if os.environ.get("ADAMML_NO_REMAT_POLICY") == "1":
        cfg.model.remat_policy = False
    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    inputs = example_inputs(cfg, batch=batch, num_segments=5, rng=rng)
    inputs = [x.astype(jnp.bfloat16) for x in inputs]
    variables = init_model(model, cfg, inputs, rng, train=True)
    params = dict(variables["params"])
    tx_main = build_optimizer("main", cfg.optim)
    tx_policy = build_optimizer("policy", cfg.optim)
    state = AdaMMLTrainState.create(
        params, variables.get("batch_stats", {}),
        tx_main.init(params["main_net"]), tx_policy.init(params["policy_net"]))
    step = make_adamml_train_step(
        model, tx_main, tx_policy, flags=StageFlags.policy_phase(),
        penalty_type="blockdrop", gammas=10.0, clip_gradient=None,
        has_policy_params=True)
    target = jnp.zeros((batch,), jnp.int32)
    lr, p_lr = jnp.asarray(1e-3), jnp.asarray(1e-2)
    cw = jnp.asarray([1.0, 0.05])

    state, m = step(state, inputs, target, lr, p_lr, cw, rng)
    float(jax.device_get(m["loss"]))  # compile + sync

    with jax.profiler.trace(outdir):
        for i in range(3):
            state, m = step(state, inputs, target, lr, p_lr, cw,
                            jax.random.fold_in(rng, i))
        float(jax.device_get(m["loss"]))

    files = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace produced (profiler unsupported on this runtime?)")
        return 1
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # map pids to process names, then sum durations by op name on DEVICE
    # lanes only (host python frames drown the signal otherwise)
    events = trace.get("traceEvents", [])
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev.get("pid")] = ev.get("args", {}).get("name", "")

    def is_device(pid):
        name = proc_names.get(pid, "").lower()
        return ("tpu" in name or "device" in name or "xla" in name
                or "accelerator" in name)

    by_name = defaultdict(lambda: [0.0, 0])
    dev_total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or not is_device(ev.get("pid")):
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))
        by_name[name][0] += dur
        by_name[name][1] += 1
        dev_total += dur
    print(f"# {len(files)} trace file(s); device processes: "
          f"{sorted(set(v for k, v in proc_names.items() if is_device(k)))}")
    print(f"# device total {dev_total / 1000.0:.2f} ms over 3 steps; "
          f"top 40 ops:")
    for name, (dur, cnt) in sorted(by_name.items(),
                                   key=lambda kv: -kv[1][0])[:40]:
        print(f"{dur / 1000.0:10.2f} ms  x{cnt:<4d} {name[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
