"""Why did the N=1200 one-shot lose to the readback path? (VERDICT r3 item 8)

Round 2 measured one-shot 45.6 ms vs readback 80.1; round 3's healthy bench
flipped it (one-shot 60.4 vs readback 41.8) with no code explanation.  The
one-shot path built to minimize dispatches must not lose to the incremental
path in the same process.  This probe decomposes both paths at N=1200 x 128
x k6 on the real chip into their RPC-level stages:

  one-shot (models/oneshot.py:settle_receipt_light):
    h2d Y | h2d psi/B/opts | dispatch fused program | fetch 6-scalar pack
  readback (core/lattice.py incremental):
    construct (graph build dispatch) | settle | receipt | its fetches

plus the slope-timed pure device compute of the fused program (the
tunnel-independent floor) and REPEATED full-pass wall times of both paths
interleaved A/B/A/B, so tunnel drift between the two measurements — the
suspected round-3 artifact, since bench.py times fused and readback passes
minutes apart — cancels.

Writes benchmarks/oneshot_smalln_1200.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")
os.environ["OSCILLINK_NATIVE_MAX_N"] = "0"  # measure the TPU paths

import numpy as np

import jax
import jax.numpy as jnp

from oscillink_tpu.utils.compile_cache import configure_compile_cache

configure_compile_cache()

N, D, K = 1200, 128, 6
REPS = 7


def med(xs):
    return float(np.median(xs))


def main():
    import oscillink_tpu as ot
    from oscillink_tpu.models.coherence import EnergyParams
    from oscillink_tpu.models.oneshot import fused_settle_receipt, settle_receipt_light

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((N, D)).astype(np.float32)
    psi = rng.standard_normal(D).astype(np.float32)

    # warm both pipelines (compiles cached / primed)
    settle_receipt_light(Y, psi, kneighbors=K)
    lat = ot.Oscillink(Y, kneighbors=K)
    lat.set_query(psi)
    lat.set_receipt_detail("light")
    lat.settle(max_iters=12, tol=1e-3)
    lat.receipt()

    out = {"config": f"N={N} D={D} k={K}", "reps": REPS}

    # ---- stage decomposition of the one-shot path -----------------------
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    opts_h = np.array([1.0, 1.0, 1e-3, 12, 1e-4, 64], dtype=np.float32)
    stages = {"h2d_Y": [], "h2d_small": [], "dispatch_sync": [], "fetch": []}
    for _ in range(REPS):
        t0 = time.perf_counter()
        Yd = jax.block_until_ready(jnp.asarray(Y))
        t1 = time.perf_counter()
        psid = jnp.asarray(psi)
        Bd = jnp.asarray(np.ones(N, np.float32))
        optsd = jnp.asarray(opts_h)
        jax.block_until_ready((psid, Bd, optsd))
        t2 = time.perf_counter()
        _, _, pack = fused_settle_receipt(Yd, psid, Bd, lam, optsd, K)
        pack.block_until_ready()
        t3 = time.perf_counter()
        vals = np.asarray(jax.device_get(pack))
        t4 = time.perf_counter()
        assert np.isfinite(vals[0])
        stages["h2d_Y"].append(1000 * (t1 - t0))
        stages["h2d_small"].append(1000 * (t2 - t1))
        stages["dispatch_sync"].append(1000 * (t3 - t2))
        stages["fetch"].append(1000 * (t4 - t3))
    out["oneshot_stages_ms"] = {k: round(med(v), 2) for k, v in stages.items()}

    # ---- interleaved A/B full-pass walls ---------------------------------
    fused_ms, read_ms = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        rec = settle_receipt_light(Y, psi, kneighbors=K)
        fused_ms.append(1000 * (time.perf_counter() - t0))
        assert np.isfinite(rec["deltaH_total"])

        t0 = time.perf_counter()
        lat = ot.Oscillink(Y, kneighbors=K)
        lat.set_query(psi)
        lat.set_receipt_detail("light")
        lat.settle(dt=1.0, max_iters=12, tol=1e-3)
        rec2 = lat.receipt()
        read_ms.append(1000 * (time.perf_counter() - t0))
        assert np.isfinite(rec2["deltaH_total"])
    out["interleaved_ms"] = {
        "oneshot_median": round(med(fused_ms), 2),
        "readback_median": round(med(read_ms), 2),
        "oneshot_all": [round(x, 1) for x in fused_ms],
        "readback_all": [round(x, 1) for x in read_ms],
    }

    # ---- pure device compute (slope) -------------------------------------
    import functools

    from jax import lax

    Yd = jnp.asarray(Y)
    psid = jnp.asarray(psi)
    Bd = jnp.ones(N, jnp.float32)
    optsd = jnp.asarray(opts_h)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(Y, reps):
        def body(i, carry):
            s, _ = carry
            _, _, pack = fused_settle_receipt(Y + s, psid, Bd, lam, optsd, K)
            return (jnp.minimum(jnp.abs(pack[0]), 1.0) * 1e-7, pack[0])

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), jnp.float32(0.0)))[1]

    for reps in (4, 24):
        float(jax.device_get(chain(Yd, reps)))
    ts = []
    for reps in (4, 24, 4, 24):
        t0 = time.perf_counter()
        float(jax.device_get(chain(Yd, reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    out["device_compute_slope_ms"] = round(
        ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / 20, 3
    )

    with open("benchmarks/oneshot_smalln_1200.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
