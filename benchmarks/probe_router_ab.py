"""Product-level A/B of the round-5 router rule on a REAL clustered corpus.

The kernel-level measurements (northstar_e2e_125k.json, smax_sweep_125k.json)
showed the windowed tier wins at low coverage when straggler volume is
bounded.  This probe demonstrates the decision at the PRODUCT level: the
same 125k clustered corpus (the 1M/8 shard regime, full-width solve) is
settled through `Oscillink` twice in one process —

  * OSCILLINK_WINDOWED_LOWCOV_SMAX=0   (pre-round-5 coverage-only gate;
    expected: ctx skipped, gather path)
  * OSCILLINK_WINDOWED_LOWCOV_SMAX=768 (round-5 default; expected: ctx
    accepted via "bounded stragglers", windowed path)

Because the env is read per ctx build, both arms run in one process with a
FRESH lattice each (settle warm-starts from the current U, so reusing one
instance across arms is not comparable work — the first A/B attempt
measured exactly that trap).  Reports the router decision (from logger
events), the settle walls (median of 3 from the un-warm-started U=Y
state via refresh), and deltaH agreement between arms.

Writes benchmarks/router_ab_125k.json.
Run detached: nohup python benchmarks/probe_router_ab.py > /tmp/routerab.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")

import numpy as np

N, D, K = 125_000, 768, 8


def main():
    import oscillink_tpu as ot

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((64, D)).astype(np.float32)
    assign = rng.integers(0, 64, size=N)
    Y = (centers[assign] + 0.35 * rng.standard_normal((N, D))).astype(
        np.float32
    )
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )

    out = {
        "config": f"N={N} D={D} k={K}, real clustered corpus (64 centers, "
        "the northstar_e2e corpus family), single chip, full-width solve",
        "arms": {},
    }

    for label, env in (("old_gate", "0"), ("round5_gate", "768")):
        os.environ["OSCILLINK_WINDOWED_LOWCOV_SMAX"] = env
        events: list = []
        lat = ot.Oscillink(Y, kneighbors=K)
        lat.set_logger(lambda ev, p, events=events: events.append((ev, p)))
        t0 = time.perf_counter()
        lat.rebuild_graph(kneighbors=K)
        rebuild_ms = 1000.0 * (time.perf_counter() - t0)
        lat.set_query(psi)
        decision = [
            (ev, {k: p.get(k) for k in
                  ("coverage", "s_max", "reason", "accepted", "stragglers")})
            for ev, p in events
            if ev in ("window_ctx", "window_ctx_skipped")
        ]
        settle_walls, t_ms_list = [], []
        for i in range(4):  # first is warmup/compile
            # reset to the fresh-lattice state so every repeat performs the
            # FIRST-settle work (settle warm-starts from the current U;
            # without the reset later repeats converge in 1 iteration and
            # the arms are not comparable)
            lat._U_dev = lat._Y_dev
            t0 = time.perf_counter()
            info = lat.settle(max_iters=12, tol=1e-3)
            w = 1000.0 * (time.perf_counter() - t0)
            iters = int(info["iters"])  # materializes lazily
            if i:
                settle_walls.append(w)
                t_ms_list.append(float(info["t_ms"]))
        lat.set_receipt_detail("light")
        rec = lat.receipt()
        out["arms"][label] = {
            "router": decision,
            "rebuild_ms": round(rebuild_ms, 1),
            "settle_ms_median3": round(float(np.median(settle_walls)), 1),
            "settle_ms_all": [round(w, 1) for w in settle_walls],
            "settle_t_ms_all": [round(w, 1) for w in t_ms_list],
            "iters": iters,
            "deltaH_total": rec["deltaH_total"],
        }
        print(f"# {label}: {json.dumps(out['arms'][label])}", flush=True)

    a, b = out["arms"]["old_gate"], out["arms"]["round5_gate"]
    out["deltaH_rel_delta"] = abs(a["deltaH_total"] - b["deltaH_total"]) / (
        abs(a["deltaH_total"]) + 1e-30
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "router_ab_125k.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
