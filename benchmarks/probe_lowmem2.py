"""Follow-up to probe_lowmem: 1M kloop block-size sweep + bounded-temp CG.

probe_lowmem measured at 1M full-width: pairseq 175.9, flat rb125k 160.5,
kloop rb125k 141.0 ms/apply — but the 5-iter CG with the rb125k flat matvec
(peak ~15.1 GB) failed remote compile.  This probe finds the largest kloop
block size whose CG peak fits (~12.5 GB at rb31250) and times the solve.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

R1, R2 = 3, 9


def slope_time(make_chain, label=""):
    c1, c2 = make_chain(R1), make_chain(R2)
    float(jax.device_get(c1()))
    float(jax.device_get(c2()))
    ts = []
    for c in (c1, c2, c1, c2):
        t0 = time.perf_counter()
        float(jax.device_get(c()))
        ts.append((time.perf_counter() - t0) * 1000.0)
    per = ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)
    print(f"{label:58s} {per:9.2f} ms/apply", flush=True)
    return per


def matvec_kloop_blocked(X, idx, wn, rb):
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
    def mk(R):
        @jax.jit
        def chain(X, idx, wn):
            def body(i, acc):
                return matvec(acc, idx, wn, *extra) * 0.999

            out = lax.fori_loop(0, R, body, X)
            return jnp.sum(out[:8, :8])

        return lambda: chain(X, idx, wn)

    return mk


def cg5(rb, Y, idx, wn, B, lamG, lamC, lamQ, iters=5):
    def M_mul(p):
        return (lamG * p + lamC * matvec_kloop_blocked(p, idx, wn, rb)
                + lamQ * (B[:, None] * p))

    inv_M = 1.0 / (lamG + lamQ * B + 1e-12)
    x = Y
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


def main():
    n, d, k = 1_000_000, 768, 8
    print(f"device: {jax.devices()[0]}  N={n}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    idx = jax.random.randint(k2, (n, k), 0, n, dtype=jnp.int32)
    wn = jax.random.uniform(k3, (n, k), dtype=jnp.float32) * 0.1
    jax.block_until_ready((X, idx, wn))
    res = {}
    for rb in (15_625, 31_250, 62_500):
        res[f"kloop_rb{rb}"] = slope_time(
            make_matvec_chain(matvec_kloop_blocked, X, idx, wn, rb),
            f"kloop rb={rb}",
        )

    B = jnp.ones((n,), dtype=jnp.float32)
    for rb in (31_250, 62_500):
        cg_j = jax.jit(
            lambda Y, idx, wn, B, rb=rb: cg5(
                rb, Y, idx, wn, B,
                jnp.float32(1.0), jnp.float32(0.5), jnp.float32(4.0),
            )
        )
        try:
            t0 = time.perf_counter()
            v = float(jax.device_get(cg_j(X, idx, wn, B)))
            cold = (time.perf_counter() - t0) * 1000
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(jax.device_get(cg_j(X, idx, wn, B)))
                times.append((time.perf_counter() - t0) * 1000)
            res[f"cg5_kloop_rb{rb}_ms"] = round(min(times), 1)
            print(f"cg5 kloop rb={rb}: cold={cold:.0f} warm={[f'{t:.0f}' for t in times]} val={v:.3f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"cg5 rb={rb}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            res[f"cg5_kloop_rb{rb}_ms"] = f"failed: {type(e).__name__}"

    print(json.dumps(res), flush=True)
    with open("benchmarks/probe_lowmem2.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
