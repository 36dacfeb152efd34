"""Modeled GFLOPs for adaptive-selection reporting.

Two mechanisms:
  1. The fixed per-segment cost table and the selection-rate-weighted total,
     numerically identical to the reference (reference utils/utils.py:510-535).
     This is the parity metric: it models what an ideal conditional executor
     would spend -- the reference never actually skips masked modalities
     (reference models/adamml.py:82-86).
  2. An analytic per-module FLOPs counter for our flax models, replacing the
     reference's torchsummary text parsing (reference utils/utils.py:98-108,
     train_unimodal.py:133).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

# Per-segment FLOPs tables (reference utils/utils.py:512-523), units: FLOPs.
MAIN_FLOPS: Dict[str, int] = {
    "rgb": 14_135_984_128,
    "flow": 16_338_911_232,
    "sound": 381_739_008,
}

POLICY_FLOPS: Dict[str, int] = {
    "rgb": 375_446_400,
    "sound": 381_739_008,
    "rgbdiff": 909_283_200,
    "lstm": 2_359_296,
}


def flops_computation(modality: Sequence[str], ratios: Mapping[str, float],
                      num_segments: int) -> float:
    """Selection-weighted modeled GFLOPs per video
    (reference utils/utils.py:510-535).

    `ratios` maps major-modality name -> mean selection rate in [0, 1]
    (an AverageMeter.avg in the reference; a plain float here).
    """
    total = 0.0
    for m in modality:
        if m in ("sound", "rgb"):
            total += MAIN_FLOPS[m] * num_segments * float(ratios[m])
            total += POLICY_FLOPS[m] * num_segments
        else:  # flow main net gated by the rgbdiff-proxy policy
            total += MAIN_FLOPS["flow"] * num_segments * float(ratios["flow"])
            total += POLICY_FLOPS["rgbdiff"] * num_segments
    total += POLICY_FLOPS["lstm"] * num_segments
    return total / 1e9


def count_model_flops(model, variables, *args, **kwargs) -> int:
    """Analytic forward-pass FLOPs of a flax module via XLA cost analysis.

    Counts the HLO flops of the jitted apply -- the number XLA will actually
    schedule on the MXU, which replaces torchsummary estimates.
    """
    import jax

    def fwd(v, *a):
        return model.apply(v, *a, **kwargs)

    lowered = jax.jit(fwd).lower(variables, *args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns a list per device
        analysis = analysis[0]
    return int(analysis.get("flops", 0.0))
