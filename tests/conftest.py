"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-host/multi-chip logic is tested on one host via
xla_force_host_platform_device_count (SURVEY.md section 4's substitute for the
reference's nonexistent distributed tests).
"""

import os

# Must run before jax initializes.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
