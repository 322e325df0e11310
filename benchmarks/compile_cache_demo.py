"""Persistent-compilation-cache demo: second fresh process skips the compile.

VERDICT r3 item 4: the window-ctx cold compile is a measured 36 minutes at
500k and the fast-scan build compile 227 s; `utils/compile_cache.py` wires
JAX's persistent cache from OSCILLINK_COMPILE_CACHE_DIR.  This demo proves
the wiring end-to-end: two FRESH python processes run the same real library
program (Oscillink settle at a serving shape) with the cache dir set; the
second must load the executable from disk instead of recompiling.

Writes benchmarks/compile_cache_demo.json with both processes' first-call
(trace+compile+run) wall times and the cache-entry count.

Usage:  python benchmarks/compile_cache_demo.py [--cpu]
  --cpu forces the CPU backend in the children (the axon TPU tunnel ignores
  JAX_PLATFORMS; children use jax.config to force it).  Default: the real
  backend.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
if {cpu!r} == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
from oscillink_tpu.utils.compile_cache import configure_compile_cache
configure_compile_cache()
import numpy as np, oscillink_tpu as ot
import jax
rng = np.random.default_rng(7)
N, D = 4096, 256
Y = rng.standard_normal((N, D)).astype(np.float32)
psi = rng.standard_normal(D).astype(np.float32)
t0 = time.perf_counter()
lat = ot.Oscillink(Y, kneighbors=8)
lat.set_query(psi)
out = lat.settle(max_iters=12, tol=1e-3)
t1 = time.perf_counter()
print("FIRSTCALL_S", t1 - t0, out["iters"], flush=True)
"""


def run_child(cache_dir: str, cpu: bool) -> float:
    env = dict(os.environ)
    env["OSCILLINK_COMPILE_CACHE_DIR"] = cache_dir
    env["OSCILLINK_COMPILE_CACHE_MIN_S"] = "0"
    env.pop("OSCILLINK_NATIVE_MAX_N", None)  # force the JAX path
    env["OSCILLINK_NATIVE_MAX_N"] = "0"
    code = CHILD.format(repo=REPO, cpu="1" if cpu else "0")
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    if p.returncode != 0:
        raise RuntimeError(f"child failed:\n{p.stdout}\n{p.stderr}")
    for line in p.stdout.splitlines():
        if line.startswith("FIRSTCALL_S"):
            return float(line.split()[1])
    raise RuntimeError(f"no FIRSTCALL_S in child output:\n{p.stdout}")


def main():
    cpu = "--cpu" in sys.argv
    cache_dir = tempfile.mkdtemp(prefix="oscillink_jaxcache_")
    try:
        cold_s = run_child(cache_dir, cpu)
        entries = sum(1 for _ in os.scandir(cache_dir))
        warm_s = run_child(cache_dir, cpu)
        out = {
            "backend": "cpu" if cpu else "default (tpu under axon)",
            "program": "Oscillink(N=4096,D=256,k=8) build+settle, fresh process",
            "cold_first_call_s": round(cold_s, 2),
            "cache_entries_after_cold": entries,
            "warm_first_call_s": round(warm_s, 2),
            "speedup": round(cold_s / warm_s, 2) if warm_s > 0 else None,
            "note": "both runs are FRESH python processes; the only shared "
                    "state is OSCILLINK_COMPILE_CACHE_DIR",
        }
        with open(os.path.join(REPO, "benchmarks", "compile_cache_demo.json"),
                  "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
