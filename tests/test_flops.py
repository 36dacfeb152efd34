import pytest

from adamml_tpu.utils.flops import flops_computation, MAIN_FLOPS, POLICY_FLOPS


def test_table_values_match_reference():
    # reference utils/utils.py:512-523
    assert MAIN_FLOPS["rgb"] == 14135984128
    assert MAIN_FLOPS["flow"] == 16338911232
    assert MAIN_FLOPS["sound"] == 381739008
    assert POLICY_FLOPS["lstm"] == 2359296


def test_rgb_sound_full_selection():
    ratios = {"rgb": 1.0, "sound": 1.0}
    flops = flops_computation(["rgb", "sound"], ratios, num_segments=5)
    # derived figure in BASELINE.md (~76.39 GFLOPs/video)
    assert flops == pytest.approx(76.39, abs=0.05)


def test_rgb_flow_full_selection():
    ratios = {"rgb": 1.0, "flow": 1.0}
    flops = flops_computation(["rgb", "flow"], ratios, num_segments=5)
    assert flops == pytest.approx(158.81, abs=0.05)


def test_selection_scales_main_cost_only():
    full = flops_computation(["rgb"], {"rgb": 1.0}, 5)
    half = flops_computation(["rgb"], {"rgb": 0.5}, 5)
    zero = flops_computation(["rgb"], {"rgb": 0.0}, 5)
    policy_only = (POLICY_FLOPS["rgb"] * 5 + POLICY_FLOPS["lstm"] * 5) / 1e9
    assert zero == pytest.approx(policy_only)
    assert full - half == pytest.approx(half - zero)
