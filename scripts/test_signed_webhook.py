#!/usr/bin/env python
"""Send a signed Stripe-style test event to a running service.

Reference-named counterpart of `scripts/test_signed_webhook.py` (reference
:1-90, which targets its deployed Cloud Run URLs).  This version targets
any URL (default a local dev server), builds the `Stripe-Signature` header
the same way the service verifies it (service/webhooks.py:
verify_stripe_signature — `t=<ts>,v1=HMAC_SHA256(secret, f"{t}.{payload}")`)
and prints one status line.  Useful for smoke-testing a deployment's
webhook path without involving Stripe.

Usage:
  OSCILLINK_STRIPE_WEBHOOK_SECRET=whsec_... python scripts/test_signed_webhook.py \
      [--url http://127.0.0.1:8000/stripe/webhook] \
      [--event-type checkout.session.completed] [--bad-signature]

Exit codes: 0 = service accepted (HTTP 200), 1 = transport error,
2 = non-200 response (expected with --bad-signature).
"""

from __future__ import annotations

import argparse
import hashlib
import hmac
import json
import os
import sys
import time
import urllib.error
import urllib.request
import uuid


def sign(payload: bytes, secret: str, ts: int) -> str:
    mac = hmac.new(secret.encode(), f"{ts}.".encode() + payload, hashlib.sha256)
    return f"t={ts},v1={mac.hexdigest()}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", default="http://127.0.0.1:8000/stripe/webhook")
    ap.add_argument("--event-type", default="checkout.session.completed")
    ap.add_argument(
        "--secret",
        default=os.getenv("OSCILLINK_STRIPE_WEBHOOK_SECRET", "")
        or os.getenv("STRIPE_WEBHOOK_SECRET", ""),
    )
    ap.add_argument(
        "--bad-signature",
        action="store_true",
        help="send a corrupted v1 to confirm the service REJECTS it",
    )
    args = ap.parse_args(argv)
    if not args.secret:
        print(
            "ERROR: no secret (--secret or OSCILLINK_STRIPE_WEBHOOK_SECRET)",
            file=sys.stderr,
        )
        return 1

    event_id = f"evt_test_{uuid.uuid4().hex[:12]}"
    payload = json.dumps(
        {
            "id": event_id,
            "type": args.event_type,
            "data": {"object": {"id": f"cs_test_{uuid.uuid4().hex[:8]}"}},
        }
    ).encode()
    header = sign(payload, args.secret, int(time.time()))
    if args.bad_signature:
        header = header[:-4] + "dead"

    req = urllib.request.Request(
        args.url,
        data=payload,
        headers={
            "Content-Type": "application/json",
            "Stripe-Signature": header,
        },
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = resp.read().decode()
            print(f"{args.url} -> {resp.status} id={event_id} body={body[:200]}")
            return 0
    except urllib.error.HTTPError as e:
        print(f"{args.url} -> {e.code} id={event_id} body={e.read().decode()[:200]}")
        return 2
    except OSError as e:
        print(f"ERROR: {args.url}: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
