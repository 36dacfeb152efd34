#!/usr/bin/env python3
"""AOT memory analysis of the flagship train step.

Compiles (without executing) the same policy-phase step bench.py measures and
prints XLA's memory breakdown -- peak temp allocation, argument/output/alias
sizes -- plus the largest live buffers if available. Used to chase
RESOURCE_EXHAUSTED at the flagship batch without paying full bench runs.

  python tools/mem_analysis.py [batch] [fused_tpool 0|1] [remat_policy 0|1]

Env: ADAMML_TPOOL_BWD=jnp forces the jnp-composition VJP for the fused pool
(A/B of the Pallas backward's memory effect).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

# share bench.py's persistent compile cache so an AOT analysis seeds the
# bench's (identical) step program and vice versa
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/adamml_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    fused_tpool = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
    remat_policy = (sys.argv[3] != "0") if len(sys.argv) > 3 else True

    from __graft_entry__ import _flagship_cfg
    from adamml_tpu.models.model_builder import (build_model, example_inputs,
                                                 init_model)
    from adamml_tpu.train.optim import build_optimizer
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    cfg = _flagship_cfg()
    cfg.model.fused_tpool = fused_tpool
    cfg.model.remat_policy = remat_policy
    if os.environ.get("ADAMML_REMAT_STAGES"):
        cfg.model.remat_stages = tuple(
            int(s) for s in os.environ["ADAMML_REMAT_STAGES"].split(","))
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
    lowered = step.lower(state, inputs, target, jnp.asarray(1e-3),
                         jnp.asarray(1e-2), jnp.asarray([1.0, 0.05]), rng)
    print(f"# lowered (batch={batch} fused_tpool={fused_tpool}); compiling...",
          flush=True)
    compiled = lowered.compile()
    # optimized-HLO dump via the PJRT client API (works even when the relay
    # compiles server-side and --xla_dump_to never touches this filesystem)
    hlo_out = os.environ.get("ADAMML_HLO_OUT")
    if hlo_out:
        try:
            with open(hlo_out, "w") as f:
                f.write(compiled.as_text())
            print(f"# optimized HLO written to {hlo_out}", flush=True)
        except Exception as e:  # keep the memory numbers even if HLO fails
            print(f"# HLO dump failed: {e!r}", flush=True)
    ma = compiled.memory_analysis()
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return 1
    gb = 1024 ** 3
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k}: {v / gb:.3f} GiB")
    peakish = ma.temp_size_in_bytes + ma.argument_size_in_bytes + (
        ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(f"args + temp + (out - aliased): {peakish / gb:.3f} GiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
