#!/usr/bin/env python
"""Breaking-change detector between two exported OpenAPI schema files.

Reference-named counterpart of `scripts/check_openapi_diff.py` (reference
:1-80; its `_simple` variant differs only in reporting).  The CI gate
normally runs `export_openapi.py --check`, which regenerates the current
schema in-process; this standalone form compares two ALREADY-EXPORTED
files, which is what release tooling wants when the baseline comes from a
published artifact rather than the working tree.

Breaking = anything present in the baseline that the current schema lost:
removed paths, removed methods on a surviving path, or removed request/
response schema fields.  Additions are never breaking.

Usage:
  python scripts/export_openapi.py --out /tmp/openapi_current.json
  python scripts/check_openapi_diff.py \
      --baseline openapi_baseline.json --current /tmp/openapi_current.json

Exit codes: 0 = no breaking removals, 1 = file missing/unreadable,
2 = breaking change (each removal printed as `REMOVED <dotted.path>`).
"""

from __future__ import annotations

import argparse
import json
import sys


def _node_paths(obj, prefix: str = "") -> set[str]:
    """Dotted key-paths for every dict node; lists collapse to one node
    (element order/count changes are not breaking by themselves)."""
    out: set[str] = set()
    if isinstance(obj, dict):
        for key, val in obj.items():
            path = f"{prefix}.{key}" if prefix else str(key)
            out.add(path)
            out |= _node_paths(val, path)
    elif isinstance(obj, list):
        out.add(f"{prefix}[]")
        for item in obj:
            out |= _node_paths(item, f"{prefix}[]")
    return out


def _load(path: str) -> dict | None:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError) as e:
        print(f"ERROR: cannot load {path}: {e}", file=sys.stderr)
        return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--current", required=True)
    args = ap.parse_args(argv)

    baseline = _load(args.baseline)
    current = _load(args.current)
    if baseline is None or current is None:
        return 1

    removed = sorted(_node_paths(baseline) - _node_paths(current))
    if removed:
        for path in removed:
            print(f"REMOVED {path}")
        print(f"BREAKING: {len(removed)} key(s) removed vs baseline")
        return 2
    print("OK: no breaking removals")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
