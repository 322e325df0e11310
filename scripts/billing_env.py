#!/usr/bin/env python
"""Billing environment helper: price map + dotenv generation.

Cross-platform counterpart of the reference's three PowerShell-only
billing helpers (`set_price_map_from_json.ps1`, `write_dotenv_billing.ps1`,
`setup_billing_local.ps1`): converts a `price_map.json`
(`{"price_...": "pro", ...}`) into the `OSCILLINK_STRIPE_PRICE_MAP` value
the service parses (service/billing.py:price_map — JSON object or
`price:tier;price:tier`), and optionally writes/updates a dotenv file with
the full local-billing variable set.

Usage:
  # print an export line for the current shell
  python scripts/billing_env.py --price-map price_map.json

  # write/refresh .env.billing (preserves unrelated lines)
  python scripts/billing_env.py --price-map price_map.json \
      --dotenv .env.billing --webhook-secret whsec_... --api-key sk_test_...

Exit codes: 0 ok, 1 file missing/unparseable.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_price_map(path: str) -> dict[str, str] | None:
    try:
        with open(path) as fh:
            parsed = json.load(fh)
    except (OSError, json.JSONDecodeError) as e:
        print(f"ERROR: cannot load {path}: {e}", file=sys.stderr)
        return None
    if not isinstance(parsed, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in parsed.items()
    ):
        print(f"ERROR: {path} must be a flat JSON object of price->tier", file=sys.stderr)
        return None
    return parsed


def to_env_value(pm: dict[str, str]) -> str:
    """Semicolon form — shell-safe (no quotes/braces to escape)."""
    return ";".join(f"{pid}:{tier}" for pid, tier in sorted(pm.items()))


def write_dotenv(path: str, updates: dict[str, str]) -> None:
    """Set/replace `KEY=value` lines, preserving everything else."""
    lines: list[str] = []
    try:
        with open(path) as fh:
            lines = fh.read().splitlines()
    except OSError:
        pass
    remaining = dict(updates)
    out = []
    for line in lines:
        key = line.split("=", 1)[0].strip()
        if key in remaining:
            out.append(f"{key}={remaining.pop(key)}")
        else:
            out.append(line)
    out.extend(f"{k}={v}" for k, v in remaining.items())
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--price-map", required=True, help="price_map.json path")
    ap.add_argument("--dotenv", default=None, help="write vars to this file")
    ap.add_argument("--webhook-secret", default=None)
    ap.add_argument("--api-key", default=None, help="Stripe secret key")
    args = ap.parse_args(argv)

    pm = load_price_map(args.price_map)
    if pm is None:
        return 1
    value = to_env_value(pm)

    if args.dotenv:
        updates = {"OSCILLINK_STRIPE_PRICE_MAP": value}
        if args.webhook_secret:
            updates["OSCILLINK_STRIPE_WEBHOOK_SECRET"] = args.webhook_secret
        if args.api_key:
            updates["STRIPE_API_KEY"] = args.api_key
        write_dotenv(args.dotenv, updates)
        print(f"wrote {len(updates)} var(s) to {args.dotenv} ({len(pm)} prices)")
    else:
        print(f"export OSCILLINK_STRIPE_PRICE_MAP='{value}'")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
