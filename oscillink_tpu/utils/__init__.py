"""Host utilities: deferred device fetches, env flags, timing."""

from .lazy import DeferredFetchGroup, LazyStats  # noqa: F401
