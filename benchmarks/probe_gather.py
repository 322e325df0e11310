"""Gather cost-model probe: what bounds the CG matvec on this TPU?

block_until_ready can silently stop blocking on the tunneled runtime, so
each formulation is timed by SLOPE: T(R2 applies) - T(R1 applies) measured
via device_get of a scalar (a d2h fetch cannot complete before the compute
feeding it), which cancels the constant RPC/dispatch floor.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R1, R2 = 4, 24


def slope_time(make_chain, label=""):
    """make_chain(R) -> callable returning a scalar; times by slope."""
    c1, c2 = make_chain(R1), make_chain(R2)
    float(jax.device_get(c1()))  # compile + warm
    float(jax.device_get(c2()))
    ts = []
    for c, r in ((c1, R1), (c2, R2), (c1, R1), (c2, R2)):
        t0 = time.perf_counter()
        float(jax.device_get(c()))
        ts.append((time.perf_counter() - t0) * 1000.0)
    # average the two passes
    t_r1 = (ts[0] + ts[2]) / 2
    t_r2 = (ts[1] + ts[3]) / 2
    per = (t_r2 - t_r1) / (R2 - R1)
    print(f"{label:55s} {per:8.3f} ms/apply   (T{R1}={t_r1:.1f} T{R2}={t_r2:.1f})")
    return per


def main():
    rng = np.random.default_rng(0)
    N, K = 100_000, 8
    results = {}

    idx = rng.integers(0, N, size=(N, K)).astype(np.int32)
    wn = rng.random((N, K)).astype(np.float32) * 0.1

    for D in (128, 768):
        X = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
        idx_d = jnp.asarray(idx)
        wn_d = jnp.asarray(wn)

        def k_loop(Xc, idx_d, wn_d):
            acc = Xc
            for a in range(K):
                acc = acc - wn_d[:, a][:, None] * jnp.take(Xc, idx_d[:, a], axis=0)
            return acc

        def make(fn, *args):
            def mk(R):
                @jax.jit
                def chain():
                    def body(i, acc):
                        return fn(acc, *args) * 0.999
                    out = lax.fori_loop(0, R, body, X)
                    return jnp.sum(out[:8, :8])
                return chain
            return mk

        results[f"kloop_f32_D{D}"] = slope_time(
            make(k_loop, idx_d, wn_d), label=f"K-loop take f32 D={D}"
        )

        if D == 768:
            def flat(Xc, idx_d, wn_d):
                g = jnp.take(Xc, idx_d.reshape(-1), axis=0).reshape(N, K, -1)
                return Xc - jnp.einsum("nk,nkd->nd", wn_d, g)

            results["flat_f32_D768"] = slope_time(
                make(flat, idx_d, wn_d), label="flat [N*K] take f32 D=768"
            )

            def k_loop_bf16(Xc, idx_d, wn_d):
                Xb = Xc.astype(jnp.bfloat16)
                acc = Xc
                for a in range(K):
                    nbr = jnp.take(Xb, idx_d[:, a], axis=0).astype(jnp.float32)
                    acc = acc - wn_d[:, a][:, None] * nbr
                return acc

            results["kloop_bf16_D768"] = slope_time(
                make(k_loop_bf16, idx_d, wn_d), label="K-loop take bf16-operand D=768"
            )

            idx_seq = jnp.asarray(
                ((np.arange(N)[:, None] + np.arange(K)[None, :]) % N).astype(np.int32)
            )
            results["kloop_seqidx_D768"] = slope_time(
                make(k_loop, idx_seq, wn_d), label="K-loop take SEQUENTIAL idx D=768"
            )

            idx_local = jnp.asarray(
                ((np.arange(N)[:, None] + rng.integers(-512, 512, size=(N, K))) % N).astype(np.int32)
            )
            results["kloop_localidx_D768"] = slope_time(
                make(k_loop, idx_local, wn_d), label="K-loop take LOCAL(+-512) idx D=768"
            )

            # window fetch bandwidth: vmapped dynamic_slice [B, W, D]
            W, RB = 1024, 256
            B = N // RB
            lo = jnp.asarray(np.minimum(np.arange(B) * RB, N - W).astype(np.int32))

            def win_make(R):
                @jax.jit
                def chain():
                    def one(l, s):
                        return jnp.sum(lax.dynamic_slice(X, (l, 0), (W, X.shape[1]))) * s
                    def body(i, acc):
                        return acc * 0.5 + jnp.sum(jax.vmap(one, in_axes=(0, None))(lo, acc * 1e-20 + 1.0))
                    return lax.fori_loop(0, R, body, jnp.float32(1.0))
                return chain

            per = slope_time(win_make, label="window dynamic_slice sum [390 x 1024 x 768]")
            gb = B * W * 768 * 4 / 1e9
            print(f"{'':55s} -> window fetch {gb:.2f} GB at {gb / per * 1000:.0f} GB/s")
            results["window_fetch_D768"] = per

            # pure stream: sum over X (read 0.3 GB) — BW sanity reference
            def stream_make(R):
                @jax.jit
                def chain():
                    def body(i, acc):
                        return acc * 0.5 + jnp.sum(X * (1.0 + acc * 1e-20))
                    return lax.fori_loop(0, R, body, jnp.float32(1.0))
                return chain

            per = slope_time(stream_make, label="stream full X sum (0.31 GB)")
            print(f"{'':55s} -> stream at {0.307 / per * 1000:.0f} GB/s")
            results["stream_D768"] = per

    print(json.dumps(results))


if __name__ == "__main__":
    main()
