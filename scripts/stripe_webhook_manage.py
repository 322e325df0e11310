"""Create, list, or rotate the service's Stripe webhook endpoint (reference
scripts/stripe_create_webhook.py, stripe_setup_webhook.py,
stripe_rotate_webhook.py flows, consolidated).

Rotation deletes any enabled endpoint registered at the target URL and
recreates it with the standard event set; the NEW signing secret is printed
exactly once — store it as OSCILLINK_STRIPE_WEBHOOK_SECRET immediately.

urllib-based (no stripe SDK in this image); --dry-run prints the requests.

  python scripts/stripe_webhook_manage.py list --dry-run
  python scripts/stripe_webhook_manage.py create --base-url https://api.example
  python scripts/stripe_webhook_manage.py rotate --base-url https://api.example
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.parse
import urllib.request

API = "https://api.stripe.com"

DEFAULT_EVENTS = [
    "checkout.session.completed",
    "customer.subscription.created",
    "customer.subscription.updated",
    "customer.subscription.deleted",
]


def _req(method: str, path: str, params: dict, key: str, dry_run: bool):
    data = urllib.parse.urlencode(params)
    if dry_run:
        print(f"[dry-run] {method} {API}{path} {data}")
        return {
            "id": f"dry_{path.strip('/').replace('/', '_')}",
            "secret": "whsec_dry",
            "data": [],
        }
    url = f"{API}{path}"
    if method in ("GET", "DELETE") and data:
        url = f"{url}?{data}"
    req = urllib.request.Request(
        url,
        data=data.encode() if method == "POST" else None,
        headers={"Authorization": f"Bearer {key}"},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _endpoint_params(url: str) -> dict:
    params = {"url": url}
    for i, ev in enumerate(DEFAULT_EVENTS):
        params[f"enabled_events[{i}]"] = ev
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("action", choices=["list", "create", "rotate"])
    p.add_argument("--base-url", default="https://api.oscillink.example")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    key = os.getenv("STRIPE_SECRET_KEY", "")
    if not key and not args.dry_run:
        print("STRIPE_SECRET_KEY required (or use --dry-run)", file=sys.stderr)
        return 2
    hook_url = f"{args.base_url}/stripe/webhook"

    if args.action == "list":
        eps = _req("GET", "/v1/webhook_endpoints", {"limit": "100"}, key, args.dry_run)
        print(
            json.dumps(
                [
                    {"id": e.get("id"), "url": e.get("url"), "status": e.get("status")}
                    for e in eps.get("data", [])
                ],
                indent=2,
            )
        )
        return 0

    victims: list[str] = []
    if args.action == "rotate":
        eps = _req("GET", "/v1/webhook_endpoints", {"limit": "100"}, key, args.dry_run)
        victims = [
            e["id"]
            for e in eps.get("data", [])
            if e.get("url") == hook_url and e.get("status") == "enabled"
        ]

    # CREATE the replacement before deleting the old endpoints: delete-first
    # meant a failed create left the service with NO webhook and every
    # billing event silently dropped until someone noticed
    ep = _req("POST", "/v1/webhook_endpoints", _endpoint_params(hook_url), key, args.dry_run)
    for ep_id in victims:
        _req("DELETE", f"/v1/webhook_endpoints/{ep_id}", {}, key, args.dry_run)
        print(f"deleted {ep_id}", file=sys.stderr)
    print(
        json.dumps(
            {
                "id": ep.get("id"),
                "url": hook_url,
                "signing_secret": ep.get("secret"),
                "note": "store as OSCILLINK_STRIPE_WEBHOOK_SECRET now — shown once",
            },
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
