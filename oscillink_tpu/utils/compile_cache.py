"""Persistent XLA compilation cache configuration.

Cold compiles are the dominant fresh-process cost at scale: the 500k
window-ctx program compiles in ~36 minutes and the 1M fast-scan build in
~227 s (benchmarks/NORTHSTAR.md, analysis_late_round3).  JAX can persist
compiled executables to disk (`jax_compilation_cache_dir`) so every process
after the first loads them in seconds — but nothing enables it by default.

This module wires it from env:

  OSCILLINK_COMPILE_CACHE_DIR   directory for the persistent cache.
                                Empty/unset -> disabled (JAX default),
                                unless JAX_COMPILATION_CACHE_DIR is set,
                                which JAX itself honors.
  OSCILLINK_COMPILE_CACHE_MIN_S minimum compile seconds for an executable
                                to be persisted (default 0.5 — small service
                                shapes compile in ~1-5 s and are worth
                                caching; JAX's default 1.0 would skip some).

`configure_compile_cache()` is idempotent and safe to call before or after
JAX backend initialization (the cache is consulted at compile time, not at
backend init).  It is invoked by the service entrypoints
(`service.api.create_state`, `service.warmup.run_warmup`) so any deployment
that sets the env var gets cache hits with no code change.

No reference counterpart (the reference is NumPy-only and has no compile
step); this is TPU-operational surface, documented in docs/OPERATIONS.md.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["configure_compile_cache"]

_configured: Optional[str] = None


def configure_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache; returns the dir or None.

    Resolution order: explicit arg > OSCILLINK_COMPILE_CACHE_DIR >
    JAX_COMPILATION_CACHE_DIR (already honored by JAX itself — we only
    normalize the tuning knobs in that case).  Idempotent: repeated calls
    with the same resolution are no-ops.
    """
    global _configured
    resolved = (
        cache_dir
        or os.getenv("OSCILLINK_COMPILE_CACHE_DIR", "").strip()
        or os.getenv("JAX_COMPILATION_CACHE_DIR", "").strip()
        or None
    )
    if resolved is None:
        return None
    if _configured == resolved:
        return resolved

    import jax

    try:
        os.makedirs(resolved, exist_ok=True)
    except OSError as e:
        # an unwritable cache dir must degrade to "no cache", never crash
        # service startup (deploy/entrypoint.sh defaults the dir under
        # /var/cache — read-only rootfs / non-root users may not have it)
        import logging

        logging.getLogger("oscillink.compile_cache").warning(
            "compile cache disabled: cannot create %s (%s)", resolved, e
        )
        return None
    jax.config.update("jax_compilation_cache_dir", resolved)
    try:
        min_s = float(os.getenv("OSCILLINK_COMPILE_CACHE_MIN_S", "0.5"))
    except ValueError:
        min_s = 0.5
    # persist even fast-compiling service shapes; entry-size floor off so
    # nothing is silently skipped
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_s)
    except Exception:  # pragma: no cover — knob renamed across JAX versions
        pass
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover
        pass
    _configured = resolved
    return resolved
