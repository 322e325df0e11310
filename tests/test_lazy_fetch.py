"""DeferredFetchGroup / LazyStats behavior (the tunnel round-trip batcher)."""

import numpy as np
import jax.numpy as jnp

from oscillink_tpu.utils.lazy import DeferredFetchGroup, LazyStats


def test_group_batches_and_caches():
    group = DeferredFetchGroup()
    h1 = group.defer(jnp.float32(1.5))
    h2 = group.defer(jnp.arange(4))
    assert group.get(h1) == 1.5  # triggers one flush for both
    assert not group._pending  # everything materialized together
    np.testing.assert_array_equal(group.get(h2), np.arange(4))
    h3 = group.defer(jnp.int32(7))
    assert group.get(h3) == 7


def test_lazystats_mapping_semantics():
    group = DeferredFetchGroup()
    stats = LazyStats(
        group,
        immediate={"t_ms": 1.25},
        deferred={"iters": jnp.int32(4), "res": jnp.float32(1e-4)},
        casts={"iters": int, "res": float},
    )
    assert stats["t_ms"] == 1.25
    assert isinstance(stats["iters"], int) and stats["iters"] == 4
    assert stats.get("res") < 1e-3
    assert stats.get("missing", "dflt") == "dflt"
    assert set(stats) == {"t_ms", "iters", "res"}
    assert len(stats) == 3
    d = stats.to_dict()
    assert d["iters"] == 4
    # writes land in the immediate layer and shadow deferred values
    stats["iters"] = 99
    assert stats["iters"] == 99
    assert "iters=99" in repr(stats).replace("'iters': 99", "iters=99")


def test_peek_does_not_flush():
    """peek returns the deferred device value (or resolved host value)
    without materializing the pending set — the graph-cache snapshot path
    must not pay a blocking round-trip per MISS."""
    import jax.numpy as jnp

    from oscillink_tpu.utils.lazy import DeferredFetchGroup

    g = DeferredFetchGroup()
    h1 = g.defer(jnp.asarray(3))
    h2 = g.defer(jnp.asarray(7))
    v = g.peek(h1)
    assert g._pending and not g._results  # nothing was flushed
    # the peeked value re-defers and resolves to the same scalar
    g2 = DeferredFetchGroup()
    h3 = g2.defer(v)
    assert g2.get(h3) == 3
    assert g.get(h2) == 7  # original group still resolves normally
    assert g.peek(h2) == 7  # resolved entries peek as host values
