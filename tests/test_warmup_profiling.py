"""Service warmup shape parsing + profiling utilities."""

import numpy as np
import jax.numpy as jnp

from oscillink_tpu.service.warmup import run_warmup, warm_shapes
from oscillink_tpu.utils.profiling import device_memory_stats, time_fn


def test_warm_shapes_parsing(monkeypatch):
    monkeypatch.setenv("OSCILLINK_WARM_SHAPES", "64x16x3, 128x32x6, junk, 1x2")
    assert warm_shapes() == [(64, 16, 3), (128, 32, 6)]
    monkeypatch.delenv("OSCILLINK_WARM_SHAPES")
    assert warm_shapes() == []


def test_run_warmup(monkeypatch):
    monkeypatch.setenv("OSCILLINK_WARM_SHAPES", "32x8x3")
    assert run_warmup(verbose=False) == 1
    monkeypatch.delenv("OSCILLINK_WARM_SHAPES")
    assert run_warmup(verbose=False) == 0


def test_time_fn():
    x = jnp.asarray(np.ones((64, 64), dtype=np.float32))
    out = time_fn(lambda a: a @ a, x, repeats=3, warmup=1)
    assert out["median_ms"] >= 0.0
    assert out["repeats"] == 3


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert stats is None or "bytes_in_use" in stats
