"""Host utilities: deferred device fetches, env flags, timing, debug report."""

from .debug_report import generate_debug_report  # noqa: F401
from .lazy import DeferredFetchGroup, LazyStats  # noqa: F401
