"""Dense NumPy oracle used by parity tests (never by the production path)."""

from .reference import DenseOracle  # noqa: F401
