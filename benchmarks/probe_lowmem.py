"""Full-width matvec + low-memory CG probe at N=500k/1M, D=768, k=8.

Hypothesis (from the recorded bf16-gather result: the TPU gather engine is
LATENCY-bound per row-fetch, not byte-bound): the column-chunked large-N
solve pays col_chunks x the row-fetches — at 1M with col_chunks=8 that is
~8x the gather cost of one full-width apply.  A full-width apply needs the
CG live set cut down to fit HBM (x, r, p, Ap + bounded gather temps).

Measures (slope-timed per tpu-tunnel-measurement rules; all data created
on-device; arrays passed as jit ARGUMENTS, never captured):
  1. pair-sequenced k-loop matvec, full width (current lap_matvec regime)
  2. row-blocked flat-gather matvec (one [RB*K] take per block), RB sweep
  3. row-blocked k-loop with 4-deep unroll
  4. fused-Jacobi low-memory 5-iteration CG body with the best matvec

Run detached: cold 1M compiles can exceed tool timeouts.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R1, R2 = 3, 9


def slope_time(make_chain, label=""):
    c1, c2 = make_chain(R1), make_chain(R2)
    float(jax.device_get(c1()))  # compile + warm
    float(jax.device_get(c2()))
    ts = []
    for c, r in ((c1, R1), (c2, R2), (c1, R1), (c2, R2)):
        t0 = time.perf_counter()
        float(jax.device_get(c()))
        ts.append((time.perf_counter() - t0) * 1000.0)
    t_r1 = (ts[0] + ts[2]) / 2
    t_r2 = (ts[1] + ts[3]) / 2
    per = (t_r2 - t_r1) / (R2 - R1)
    print(f"{label:58s} {per:9.2f} ms/apply  (T{R1}={t_r1:.0f} T{R2}={t_r2:.0f})",
          flush=True)
    return per


def hbm_peak_gb():
    try:
        s = jax.devices()[0].memory_stats()
        return round(s.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:
        return None


def matvec_pairseq(X, idx, wn):
    """Current ops.graph.lap_matvec large-N regime (pair-sequenced fori)."""
    K = idx.shape[1]

    def body(j, acc):
        a = 2 * j
        i0 = lax.dynamic_index_in_dim(idx, a, 1, keepdims=False)
        i1 = lax.dynamic_index_in_dim(idx, a + 1, 1, keepdims=False)
        w0 = lax.dynamic_index_in_dim(wn, a, 1, keepdims=False)
        w1 = lax.dynamic_index_in_dim(wn, a + 1, 1, keepdims=False)
        return (acc - w0[:, None] * jnp.take(X, i0, axis=0)
                - w1[:, None] * jnp.take(X, i1, axis=0))

    return lax.fori_loop(0, K // 2, body, X)


def matvec_flatblocked(X, idx, wn, rb):
    """Row-blocked flat gather: one [RB*K]-row take per output block."""
    n, d = X.shape
    K = idx.shape[1]
    nb = n // rb

    def body(b, out):
        r0 = b * rb
        idx_b = lax.dynamic_slice(idx, (r0, 0), (rb, K))        # [RB, K]
        wn_b = lax.dynamic_slice(wn, (r0, 0), (rb, K))
        g = jnp.take(X, idx_b.reshape(-1), axis=0).reshape(rb, K, d)
        x_b = lax.dynamic_slice(X, (r0, 0), (rb, d))
        blk = x_b - jnp.einsum("nk,nkd->nd", wn_b, g)
        return lax.dynamic_update_slice(out, blk, (r0, 0))

    return lax.fori_loop(0, nb, body, jnp.zeros_like(X))


def matvec_kloop_blocked(X, idx, wn, rb):
    """Row-blocked k-loop: K unrolled [RB]-row takes per block (K in flight)."""
    n, d = X.shape
    K = idx.shape[1]
    nb = n // rb

    def body(b, out):
        r0 = b * rb
        acc = lax.dynamic_slice(X, (r0, 0), (rb, d))
        for a in range(K):
            i_a = lax.dynamic_slice(idx, (r0, a), (rb, 1))[:, 0]
            w_a = lax.dynamic_slice(wn, (r0, a), (rb, 1))[:, 0]
            acc = acc - w_a[:, None] * jnp.take(X, i_a, axis=0)
        return lax.dynamic_update_slice(out, acc, (r0, 0))

    return lax.fori_loop(0, nb, body, jnp.zeros_like(X))


def make_matvec_chain(matvec, X, idx, wn, *extra):
    """Chain applies gathering from the carry (like CG gathers from p)."""

    def mk(R):
        @jax.jit
        def chain(X, idx, wn):
            def body(i, acc):
                return matvec(acc, idx, wn, *extra) * 0.999

            out = lax.fori_loop(0, R, body, X)
            return jnp.sum(out[:8, :8])

        return lambda: chain(X, idx, wn)

    return mk


def cg5_lowmem(matvec, extra, Y, idx, wn, B, lamG, lamC, lamQ, iters=5):
    """Fused-Jacobi PCG: no z buffer, no persistent rhs; x0 = Y (donated
    upstream in the real path).  M x = lamG x + lamC L x + lamQ B x."""

    def M_mul(p):
        return lamG * p + lamC * matvec(p, idx, wn, *extra) + lamQ * (B[:, None] * p)

    inv_M = 1.0 / (lamG + lamQ * B + 1e-12)

    x = Y
    # rhs is a temp: r0 = rhs - M x0; psi term omitted (same flop class)
    r = lamG * Y - M_mul(x)
    p = r * inv_M[:, None]
    rz = jnp.sum(r * (r * inv_M[:, None]), axis=0)

    def body(i, carry):
        x, r, p, rz = carry
        Ap = M_mul(p)
        denom = jnp.sum(p * Ap, axis=0) + 1e-18
        alpha = rz / denom
        x = x + p * alpha
        r = r - Ap * alpha
        rz_new = jnp.sum(r * (r * inv_M[:, None]), axis=0)
        beta = rz_new / (rz + 1e-18)
        p = r * inv_M[:, None] + p * beta
        return (x, r, p, rz_new)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    return jnp.sum(x[:8, :8])


def run_scale(n, d, k, variants, cg=False):
    print(f"\n=== N={n} D={d} k={k} ===", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    idx = jax.random.randint(k2, (n, k), 0, n, dtype=jnp.int32)
    wn = jax.random.uniform(k3, (n, k), dtype=jnp.float32) * 0.1
    jax.block_until_ready((X, idx, wn))
    out = {}
    for name, fn, extra in variants:
        try:
            out[name] = slope_time(
                make_matvec_chain(fn, X, idx, wn, *extra), f"{name} N={n}"
            )
            out[f"{name}_hbm_peak_gb"] = hbm_peak_gb()
        except Exception as e:  # noqa: BLE001
            print(f"{name} N={n}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            out[name] = f"failed: {type(e).__name__}"
    if cg:
        # 5-iteration fused CG with the flat-blocked matvec, one program
        B = jnp.ones((n,), dtype=jnp.float32)
        rb = cg  # block size passed in
        cg_j = jax.jit(
            lambda Y, idx, wn, B: cg5_lowmem(
                matvec_flatblocked, (rb,), Y, idx, wn, B,
                jnp.float32(1.0), jnp.float32(0.5), jnp.float32(4.0),
            ),
            donate_argnums=(0,),
        )
        try:
            Xc = X.copy()
            t0 = time.perf_counter()
            v = float(jax.device_get(cg_j(Xc, idx, wn, B)))
            cold = (time.perf_counter() - t0) * 1000
            Xc = X.copy()
            t0 = time.perf_counter()
            v = float(jax.device_get(cg_j(Xc, idx, wn, B)))
            warm1 = (time.perf_counter() - t0) * 1000
            Xc = X.copy()
            t0 = time.perf_counter()
            v = float(jax.device_get(cg_j(Xc, idx, wn, B)))
            warm2 = (time.perf_counter() - t0) * 1000
            out["cg5_lowmem_flat_ms"] = round(min(warm1, warm2), 1)
            out["cg5_hbm_peak_gb"] = hbm_peak_gb()
            print(f"cg5_lowmem flat rb={rb} N={n}: cold={cold:.0f} "
                  f"warm={warm1:.0f}/{warm2:.0f} ms  val={v:.3f} "
                  f"peak={out['cg5_hbm_peak_gb']} GB", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"cg5 N={n}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            out["cg5_lowmem_flat_ms"] = f"failed: {type(e).__name__}"
    del X, idx, wn
    return out


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    res = {}

    res["n500k"] = run_scale(
        500_000, 768, 8,
        [
            ("pairseq_fullwidth", matvec_pairseq, ()),
            ("flat_rb62500", matvec_flatblocked, (62_500,)),
            ("flat_rb125000", matvec_flatblocked, (125_000,)),
            ("kloop_rb125000", matvec_kloop_blocked, (125_000,)),
        ],
        cg=125_000,
    )
    res["n1m"] = run_scale(
        1_000_000, 768, 8,
        [
            ("pairseq_fullwidth", matvec_pairseq, ()),
            ("flat_rb62500", matvec_flatblocked, (62_500,)),
            ("flat_rb125000", matvec_flatblocked, (125_000,)),
            ("kloop_rb125000", matvec_kloop_blocked, (125_000,)),
        ],
        cg=125_000,
    )

    print(json.dumps(res), flush=True)
    with open("benchmarks/probe_lowmem.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
