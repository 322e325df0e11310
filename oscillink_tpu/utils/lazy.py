"""Deferred, batched device→host transfers.

On tunneled TPU runtimes every device→host fetch is a fixed-latency RPC
(~30 ms measured through axon), while a single `jax.device_get` of MANY
arrays costs one RPC.  The lattice therefore never fetches eagerly: device
values are registered in a `DeferredFetchGroup`, and the first host-side
access to any of them materializes ALL pending values in one batched
transfer.  `LazyStats` is the dict-like view used for settle / U*-solve
diagnostics so the public API stays plain-dict compatible.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict, Iterator

import numpy as np

__all__ = ["DeferredFetchGroup", "LazyStats"]


def _to_host_scalar(v):
    v = np.asarray(v)
    return v.item() if v.ndim == 0 else v


class DeferredFetchGroup:
    """Registry of device arrays fetched together in one batched transfer."""

    def __init__(self) -> None:
        self._pending: Dict[int, Any] = {}
        self._results: Dict[int, Any] = {}
        self._next_handle = 0

    def defer(self, device_value) -> int:
        """Register a device value; returns a handle for later `get`."""
        h = self._next_handle
        self._next_handle += 1
        self._pending[h] = device_value
        return h

    def get(self, handle: int, *, pop: bool = False):
        """Materialize (batched) and return the value for ``handle``.

        ``pop=True`` evicts the result afterwards — one-shot consumers
        (receipt diagnostics register four [N]-sized arrays per call) must
        use it, or the registry grows without bound on long-lived
        lattices (~13 MB/receipt at N=1M)."""
        if handle not in self._results:
            self.flush()
        return self._results.pop(handle) if pop else self._results[handle]

    def peek(self, handle: int):
        """Value behind ``handle`` WITHOUT forcing a flush: the resolved
        host value if already fetched, else the still-deferred device
        value.  Lets a consumer re-`defer` it elsewhere (the graph-cache
        snapshot) without paying a blocking device round-trip."""
        if handle in self._results:
            return self._results[handle]
        return self._pending[handle]

    def flush(self) -> None:
        """Fetch every pending value in a single device_get."""
        if not self._pending:
            return
        import jax

        handles = list(self._pending.keys())
        values = jax.device_get([self._pending[h] for h in handles])
        for h, v in zip(handles, values):
            self._results[h] = _to_host_scalar(v)
        self._pending.clear()


class LazyStats(Mapping):
    """Read-only dict whose device-valued entries fetch lazily and batched.

    ``immediate`` entries are plain host values; ``deferred`` entries are
    device arrays resolved through the shared fetch group on first access.
    """

    def __init__(
        self,
        group: DeferredFetchGroup,
        immediate: Dict[str, Any] | None = None,
        deferred: Dict[str, Any] | None = None,
        casts: Dict[str, Any] | None = None,
    ) -> None:
        self._imm: Dict[str, Any] = dict(immediate or {})
        self._group = group
        self._handles = {k: group.defer(v) for k, v in (deferred or {}).items()}
        self._casts = casts or {}

    def __getitem__(self, key: str):
        if key in self._imm:
            return self._imm[key]
        if key in self._handles:
            # cache locally and evict from the shared group so the group's
            # registry doesn't accumulate an entry per stats object forever
            v = self._group.get(self._handles.pop(key), pop=True)
            cast = self._casts.get(key)
            v = cast(v) if cast is not None else v
            self._imm[key] = v
            return v
        raise KeyError(key)

    def __setitem__(self, key: str, value) -> None:
        self._imm[key] = value
        self._handles.pop(key, None)

    def __iter__(self) -> Iterator[str]:
        # snapshot: accessing an item during iteration (to_dict/repr) moves
        # it from _handles to _imm
        yield from list(self._imm) + [
            k for k in self._handles if k not in self._imm
        ]

    def __len__(self) -> int:
        return len(set(self._imm) | set(self._handles))

    def __repr__(self) -> str:  # materializes — repr implies inspection
        return repr({k: self[k] for k in self})

    def to_dict(self) -> Dict[str, Any]:
        return {k: self[k] for k in self}

    def get(self, key: str, default=None):
        try:
            return self[key]
        except KeyError:
            return default
