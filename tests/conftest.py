"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform is
forced through jax.config before any test imports compile anything.  The
8 virtual host devices back the sharding / multi-chip tests.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
