"""Sharded serving at 500k rows on the virtual mesh (VERDICT r3 item 7).

Correctness at target serving scale: `parallel.serve.sharded_serve`
completes a 500,000-row request on the 8-virtual-device CPU mesh over a
prebuilt graph (the O(N^2) similarity build is covered separately by
bit-parity tests and the real-chip build probes — on the 1-core CI runner
it would dominate the test at ~27 min for zero extra coverage), the
composed deltaH matches a single-device execution of the same receipt
pipeline, and the receipt signs/verifies with the exact payload scheme the
service's sharded path emits (service/sharded_path.py signature block).

Heavy test (~2-4 min: GSPMD compile at 500k shapes + the solves); the
500k analog of test_scale_131k.py.
"""

import numpy as np

import jax
import jax.numpy as jnp

from oscillink_tpu.core.receipts import sign_payload, verify_receipt
from oscillink_tpu.models.coherence import EnergyParams
from oscillink_tpu.ops.graph import graph_from_topk
from oscillink_tpu.parallel.mesh import lattice_mesh
from oscillink_tpu.parallel.serve import _serve_receipt, sharded_serve

N, D, K = 500_000, 16, 4


def _synthetic_graph_inputs():
    rng = np.random.default_rng(0)
    # symmetric offsets so every edge is MUTUAL (the mutual mask would
    # erase non-reciprocated synthetic neighbors); +-70007 crosses shard
    # boundaries so the 8-way halo traffic is real
    offsets = np.array([1, -1, 70007, -70007], dtype=np.int64)
    assert len(offsets) == K
    idx = ((np.arange(N)[:, None] + offsets[None, :]) % N).astype(np.int32)
    vals = (0.2 + 0.7 * rng.random((N, K))).astype(np.float32)
    Y = rng.standard_normal((N, D)).astype(np.float32)
    psi = rng.standard_normal(D).astype(np.float32)
    gates = (0.5 + 0.5 * rng.random(N)).astype(np.float32)
    return vals, idx, Y, psi, gates


def test_sharded_serve_500k_end_to_end():
    vals, idx, Y, psi, gates = _synthetic_graph_inputs()
    g = jax.jit(lambda v, i: graph_from_topk(v, i, row_cap=1.0))(
        jnp.asarray(vals), jnp.asarray(idx)
    )

    mesh = lattice_mesh(8)
    out = sharded_serve(
        mesh, Y, psi, gates, k=K, graph=g,
        settle_tol=1e-4, settle_iters=24, ustar_tol=1e-4, ustar_iters=40,
        bundle_k=8,
    )
    assert out["mesh_devices"] == 8
    assert out["settle_res"] <= 1e-3 and out["ustar_res"] <= 1e-3
    assert out["deltaH"] > 0 and np.isfinite(out["deltaH"])
    assert len(out["bundle"]) == 8
    assert out["n_edges"] > N  # mutual mask keeps a healthy band graph

    # single-device reference: the same receipt pipeline, unsharded inputs
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    _, _, scalars, *_ = _serve_receipt(
        g, None, jnp.asarray(Y), jnp.asarray(psi), jnp.asarray(gates), lam,
        jnp.float32(1.0), jnp.float32(1e-4), jnp.int32(24),
        jnp.float32(1e-4), jnp.int32(40), jnp.float32(0.5), 8,
    )
    scalars = jax.device_get(scalars)
    dh_single = float(scalars[0])
    rel = abs(out["deltaH"] - dh_single) / (abs(dh_single) + 1e-12)
    assert rel < 5e-4, (out["deltaH"], dh_single, rel)
    for got, want, name in (
        (out["coh_drop_sum"], float(scalars[1]), "coh"),
        (out["anchor_pen_sum"], float(scalars[2]), "anchor"),
        (out["query_term_sum"], float(scalars[3]), "query"),
    ):
        assert abs(got - want) / (abs(want) + 1e-9) < 1e-3, (name, got, want)

    # full signed receipt: the exact payload scheme sharded_path emits
    payload = {
        "sig_v": 1,
        "mode": "minimal",
        "state_sig": "test-500k",
        "deltaH_total": float(out["deltaH"]),
    }
    secret = b"scale-test-secret"
    receipt = {
        "deltaH_total": float(out["deltaH"]),
        "meta": {
            "signature": {
                "algorithm": "HMAC-SHA256",
                "payload": payload,
                "signature": sign_payload(payload, secret),
            }
        },
    }
    assert verify_receipt(receipt, secret)
    assert not verify_receipt(receipt, b"wrong-secret")
