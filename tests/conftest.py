"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-host/multi-chip logic is tested on one host via
xla_force_host_platform_device_count (SURVEY.md section 4's substitute for the
reference's nonexistent distributed tests).

The axon TPU environment pre-sets JAX_PLATFORMS=axon and its sitecustomize
re-asserts it at interpreter start, so the env var alone is not enough; we
also update jax.config before any backend is touched.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA:CPU's default conv/matmul precision truncates f32 operands (bf16-like
# passes, ~2.5e-3 relative error per conv -- measured against f64 ground
# truth, round 3); torch computes true f32. Full precision is required for
# the torch-parity suites to be meaningful.
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: XLA:CPU compiles dominate test time on 1-core CI
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8


def pytest_configure(config):
    # Test tiers (VERDICT r3 next item 8): the full suite outgrew a 1-core
    # host, so heavy chunks are marked and the FAST tier is the default
    # regression signal:
    #   pytest -m "not slow" tests/   -> fast tier, minutes on one core
    #   pytest -m parity tests/       -> torch-oracle parity suites only
    #   pytest tests/                 -> everything
    config.addinivalue_line(
        "markers", "slow: heavy chunks (full-curriculum e2e, bench child "
        "processes, multi-process mesh, torch-parity trajectories)")
    config.addinivalue_line(
        "markers", "parity: suites that build the torch reference model "
        "as a numerical oracle")
