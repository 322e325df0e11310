"""Stripe provisioning (reference scripts/stripe_* family, consolidated):
create products/prices, register the webhook endpoint, emit the price->tier
map and payment links.  Talks to the Stripe REST API with urllib (no stripe
SDK in this image); --dry-run prints the requests instead.

  python scripts/stripe_setup.py --dry-run
  STRIPE_SECRET_KEY=sk_... python scripts/stripe_setup.py --base-url https://api.oscillink.example
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse
import json
import os
import sys
import urllib.parse
import urllib.request

TIER_PRODUCTS = {
    "beta": {"name": "Oscillink Beta", "unit_amount": 900, "interval": "month"},
    "pro": {"name": "Oscillink Pro", "unit_amount": 4900, "interval": "month"},
    "enterprise": {"name": "Oscillink Enterprise", "unit_amount": 49900, "interval": "month"},
}


def _stripe_post(path: str, params: dict, key: str, dry_run: bool):
    data = urllib.parse.urlencode(params)
    if dry_run:
        print(f"[dry-run] POST https://api.stripe.com{path} {data}")
        # derive a unique fake id from the full params — keying on 'name'
        # alone collided for prices (no name key), collapsing the dry-run
        # price_map to one entry
        import hashlib

        tag = params.get("name") or params.get("metadata[tier]") or hashlib.sha256(
            data.encode()
        ).hexdigest()[:8]
        return {"id": f"dry_{path.strip('/').replace('/', '_')}_{tag}"}
    req = urllib.request.Request(
        f"https://api.stripe.com{path}",
        data=data.encode(),
        headers={"Authorization": f"Bearer {key}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="https://api.oscillink.example")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--out", default="price_map.json")
    args = p.parse_args(argv)

    key = os.getenv("STRIPE_SECRET_KEY", "")
    if not key and not args.dry_run:
        print("STRIPE_SECRET_KEY required (or use --dry-run)", file=sys.stderr)
        return 2

    price_map: dict[str, str] = {}
    for tier, spec in TIER_PRODUCTS.items():
        product = _stripe_post(
            "/v1/products", {"name": spec["name"], "metadata[tier]": tier}, key, args.dry_run
        )
        price = _stripe_post(
            "/v1/prices",
            {
                "product": product["id"],
                "unit_amount": spec["unit_amount"],
                "currency": "usd",
                "recurring[interval]": spec["interval"],
                "metadata[tier]": tier,
            },
            key,
            args.dry_run,
        )
        price_map[price["id"]] = tier

    # event list shared with stripe_webhook_manage so the two scripts can't
    # drift (this one previously omitted customer.subscription.created,
    # which the service handler processes)
    from stripe_webhook_manage import _endpoint_params

    webhook = _stripe_post(
        "/v1/webhook_endpoints",
        _endpoint_params(f"{args.base_url}/stripe/webhook"),
        key,
        args.dry_run,
    )

    with open(args.out, "w") as f:
        json.dump(price_map, f, indent=2)
    print(json.dumps({"price_map": price_map, "webhook": webhook.get("id")}, indent=2))
    # Stripe returns the signing secret ONLY in the creation response —
    # print it now or the operator can never configure verification from
    # this script's output
    secret = webhook.get("secret") or "<dry-run: none>"
    print(
        "\nExport for the service:\n"
        f"  OSCILLINK_STRIPE_PRICE_MAP='{json.dumps(price_map)}'\n"
        f"  OSCILLINK_STRIPE_WEBHOOK_SECRET={secret}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
