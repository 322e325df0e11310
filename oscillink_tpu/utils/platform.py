"""JAX platform pinning that works on this image's remote-TPU plugin.

Pinning must happen BOTH ways before anything touches a device:

- the env var alone is not enough — the tunnel TPU plugin registers its
  backend regardless of ``JAX_PLATFORMS`` (and the image's shell profile
  exports ``JAX_PLATFORMS=axon``, so ``setdefault`` is a no-op);
- the config update alone is not enough — plugin discovery still
  initializes the tunnel backend, and when the tunnel is wedged the first
  jit blocks forever.

Together they are reliable (the test suite's conftest uses the same
pattern).
"""

from __future__ import annotations

import os

__all__ = ["pin_platform"]


def pin_platform(platform: str) -> None:
    """Force the JAX platform (e.g. ``"cpu"``).  Must run before the first
    device touch; safe to call again with the same value."""
    os.environ["JAX_PLATFORMS"] = platform
    import jax

    jax.config.update("jax_platforms", platform)
