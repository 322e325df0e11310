"""Create a Stripe Payment Link for a tier (reference
scripts/stripe_create_payment_link.py behavior): finds the tier's price by
metadata, creates a payment link whose completion redirects to
``{base-url}/billing/success?session_id={CHECKOUT_SESSION_ID}`` so the
service can show the provisioned API key immediately.

urllib-based (no stripe SDK in this image); --dry-run prints the requests.

  python scripts/stripe_payment_link.py --tier beta --dry-run
  STRIPE_SECRET_KEY=sk_... python scripts/stripe_payment_link.py \
      --tier pro --allow-pro --base-url https://api.oscillink.example
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.parse
import urllib.request

API = "https://api.stripe.com"


def _req(method: str, path: str, params: dict, key: str, dry_run: bool):
    data = urllib.parse.urlencode(params)
    if dry_run:
        print(f"[dry-run] {method} {API}{path} {data}")
        return {
            "id": f"dry_{path.strip('/').replace('/', '_')}",
            "url": "https://buy.stripe.com/dry_link",
            "data": [
                {"id": "price_dry", "metadata": {"tier": params.get("metadata[tier]", "")}}
            ],
        }
    url = f"{API}{path}"
    if method == "GET" and data:
        url = f"{url}?{data}"
    req = urllib.request.Request(
        url,
        data=data.encode() if method == "POST" else None,
        headers={"Authorization": f"Bearer {key}"},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def find_price_for_tier(tier: str, key: str, dry_run: bool) -> str:
    """Price id whose metadata.tier matches (products from stripe_setup.py)."""
    if dry_run:
        print(f"[dry-run] GET {API}/v1/prices limit=100 active=true")
        return f"price_dry_{tier}"
    prices = _req("GET", "/v1/prices", {"limit": "100", "active": "true"}, key, dry_run)
    for p in prices.get("data", []):
        if (p.get("metadata") or {}).get("tier") == tier:
            return p["id"]
    raise SystemExit(
        f"no active price with metadata.tier={tier!r}; run scripts/stripe_setup.py first"
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tier", required=True, choices=["beta", "pro", "enterprise"])
    p.add_argument("--base-url", default="https://api.oscillink.example")
    p.add_argument("--price-id", help="skip the lookup and use this price")
    p.add_argument(
        "--allow-pro",
        action="store_true",
        help="pro links are hidden during early beta unless explicitly allowed",
    )
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    if args.tier == "pro" and not args.allow_pro:
        print("pro is hidden during early beta; pass --allow-pro", file=sys.stderr)
        return 2
    key = os.getenv("STRIPE_SECRET_KEY", "")
    if not key and not args.dry_run:
        print("STRIPE_SECRET_KEY required (or use --dry-run)", file=sys.stderr)
        return 2

    price = args.price_id or find_price_for_tier(args.tier, key, args.dry_run)
    link = _req(
        "POST",
        "/v1/payment_links",
        {
            "line_items[0][price]": price,
            "line_items[0][quantity]": "1",
            "after_completion[type]": "redirect",
            "after_completion[redirect][url]": (
                f"{args.base_url}/billing/success?session_id={{CHECKOUT_SESSION_ID}}"
            ),
            "metadata[tier]": args.tier,
        },
        key,
        args.dry_run,
    )
    print(json.dumps({"tier": args.tier, "price": price, "payment_link": link.get("url")}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
