"""Test configuration: CPU-only with a virtual 8-device mesh, float64 on.

All numerical parity tests run at f64 against numpy oracles; sharding tests
use the 8 virtual CPU devices.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config API reliably pins tests to the virtual CPU devices
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
