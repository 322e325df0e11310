"""aiohttp binding for the framework-free service core.

Middleware parity with the reference stack (cloud/app/main.py:76-699 and
factory.py:26-87): body-size guard (413), request-id propagation, security
headers, sampled JSON access log, per-IP + global rate limits (handled inside
`api.handle`), CORS/TrustedHost from env.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from typing import Optional

from .api import ApiRequest, ServiceState, create_state, handle
from .config import get_app_settings

try:  # pragma: no cover — optional dependency
    from aiohttp import web

    HAVE_AIOHTTP = True
except Exception:  # pragma: no cover
    HAVE_AIOHTTP = False
    web = None  # type: ignore


def _access_log(record: dict) -> None:
    if os.getenv("OSCILLINK_JSON_LOGS", "0") not in {"1", "true"}:
        return
    try:
        sample = float(os.getenv("OSCILLINK_LOG_SAMPLE", "1.0"))
    except ValueError:
        sample = 1.0
    if random.random() > sample:
        return
    sys.stderr.write(json.dumps(record, separators=(",", ":")) + "\n")


def create_app(state: Optional[ServiceState] = None):
    """Build the aiohttp application bound to a ServiceState."""
    if not HAVE_AIOHTTP:  # pragma: no cover
        raise RuntimeError("aiohttp is not available; use service.testing.LocalClient")
    st = state or create_state()
    settings = get_app_settings()

    async def dispatch(request: "web.Request") -> "web.StreamResponse":
        t0 = time.perf_counter()
        body = await request.read()
        if len(body) > settings.max_body_bytes:
            return web.json_response(
                {"detail": "request body too large"}, status=413
            )
        host = request.headers.get("Host", "")
        if settings.trusted_hosts != ("*",) and host.split(":")[0] not in settings.trusted_hosts:
            return web.json_response({"detail": "untrusted host"}, status=400)

        api_req = ApiRequest(
            method=request.method,
            path=request.path,
            headers={k.lower(): v for k, v in request.headers.items()},
            body=body,
            remote_ip=request.remote or "0.0.0.0",
            query=dict(request.query),
        )
        resp = handle(st, api_req)
        _access_log(
            {
                "ts": time.time(),
                "method": request.method,
                "path": request.path,
                "status": resp.status,
                "duration_ms": 1000.0 * (time.perf_counter() - t0),
                "request_id": resp.headers.get("X-Request-ID", ""),
            }
        )
        if isinstance(resp.body, (bytes, bytearray)):
            return web.Response(
                body=bytes(resp.body),
                status=resp.status,
                headers=resp.headers,
                content_type=resp.content_type.split(";")[0],
            )
        out = web.json_response(resp.body, status=resp.status)
        for k, v in resp.headers.items():
            out.headers[k] = v
        if settings.allowed_origins:
            out.headers["Access-Control-Allow-Origin"] = ",".join(settings.allowed_origins)
        return out

    app = web.Application(client_max_size=settings.max_body_bytes + 1024)
    app.router.add_route("*", "/{tail:.*}", dispatch)
    return app


def run(host: str = "127.0.0.1", port: int = 8000):  # pragma: no cover
    from .warmup import run_warmup

    run_warmup()
    app = create_app()
    web.run_app(app, host=host, port=port)
