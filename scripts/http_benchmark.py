"""Concurrent HTTP load benchmark for /v1/settle (reference
scripts/http_benchmark.py): fires M concurrent requests, writes per-request
latency JSONL + p50/p95/p99 summary.

  python scripts/http_benchmark.py --base http://localhost:8000 --requests 120 \
      --concurrency 8 --n 120 --d 64
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import asyncio
import json
import sys
import time

import numpy as np


async def _worker(session, url, body, headers, latencies, errors):
    t0 = time.perf_counter()
    ok = False
    try:
        async with session.post(url, data=body, headers=headers) as resp:
            await resp.read()
            if resp.status == 200:
                ok = True
            else:
                errors.append(resp.status)
    except Exception:
        errors.append(-1)
    # only SUCCESSFUL latencies enter the percentiles: a dead server's
    # instant connection-refused times would otherwise report p50<1ms
    if ok:
        latencies.append(1000 * (time.perf_counter() - t0))


async def run(args):
    import aiohttp

    rng = np.random.default_rng(args.seed)
    Y = rng.standard_normal((args.n, args.d)).astype(np.float32)
    psi = rng.standard_normal(args.d).astype(np.float32)
    body = json.dumps(
        {"Y": Y.tolist(), "psi": psi.tolist(), "options": {"max_iters": 12, "tol": 1e-3}}
    ).encode()
    headers = {"Content-Type": "application/json"}
    if args.api_key:
        headers["X-API-Key"] = args.api_key

    latencies: list[float] = []
    errors: list[int] = []
    url = args.base.rstrip("/") + "/v1/settle"
    sem = asyncio.Semaphore(args.concurrency)

    async with aiohttp.ClientSession() as session:
        # warm the service (compile)
        await _worker(session, url, body, headers, [], [])

        async def bounded():
            async with sem:
                await _worker(session, url, body, headers, latencies, errors)

        t0 = time.perf_counter()
        await asyncio.gather(*[bounded() for _ in range(args.requests)])
        wall = time.perf_counter() - t0

    lat = np.array(sorted(latencies))
    summary = {
        "requests": args.requests,
        "concurrency": args.concurrency,
        "errors": len(errors),
        "wall_s": wall,
        "rps": args.requests / wall,
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "p95_ms": float(np.percentile(lat, 95)),
        "p99_ms": float(np.percentile(lat, 99)),
    }
    if args.out:
        with open(args.out, "w") as f:
            for v in latencies:
                f.write(json.dumps({"latency_ms": v}) + "\n")
    print(json.dumps(summary, indent=2))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="http://localhost:8000")
    p.add_argument("--requests", type=int, default=120)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--n", type=int, default=120)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--api-key", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    return asyncio.run(run(args))


if __name__ == "__main__":
    sys.exit(main())
