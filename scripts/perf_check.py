"""CI perf regression gate vs a checked-in baseline (reference
scripts/perf_check.py:18-77): compares build/settle/receipt means with a
percentage tolerance; exit 1 on regression (optionally non-blocking).

  python scripts/perf_check.py --baseline scripts/perf_baseline.json \
      --current out.json --tolerance 35
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys

from oscillink_tpu import compare_perf


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--baseline", default="scripts/perf_baseline.json")
    p.add_argument("--current", required=True)
    p.add_argument("--tolerance", type=float, default=35.0)
    p.add_argument("--non-blocking", action="store_true")
    args = p.parse_args(argv)

    baseline = json.load(open(args.baseline))
    current = json.load(open(args.current))
    result = compare_perf(baseline, current, tolerance_pct=args.tolerance)
    print(json.dumps(result, indent=2))
    if result["failures"] and not args.non_blocking:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
