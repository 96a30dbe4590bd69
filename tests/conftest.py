"""Test configuration: force an 8-device virtual CPU mesh + x64.

Must run before any test module imports jax-heavy code.  The container's
sitecustomize registers the axon TPU backend and sets jax_platforms to
"axon,cpu"; overriding the config here (before first backend use) selects
CPU with 8 virtual devices for sharding tests.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
