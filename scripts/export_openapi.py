"""Export the service's OpenAPI schema (reference scripts/export_openapi.py +
CI breaking-change gate ci.yml:36-50).

The schema is generated from the service route table + pydantic models, so
it tracks the actual dispatcher.  `--check` diffs the exported surface
against openapi_baseline.json and exits non-zero when paths/methods were
removed (breaking change).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_schema() -> dict:
    from oscillink_tpu import __version__
    from oscillink_tpu.service import api
    from oscillink_tpu.service.models import (
        AutoCorrectRequest,
        CompetitorBenchRequest,
        SettleRequest,
    )

    paths: dict[str, dict] = {}
    for method, regex, handler in api._ROUTES:
        # reconstruct the template from the compiled pattern
        template = regex.pattern[1:-1]
        template = template.replace("(?P<", "{").replace(">[^/]+)", "}")
        doc = (handler.__doc__ or "").strip().splitlines()
        summary = doc[0] if doc else handler.__name__
        paths.setdefault(template, {})[method.lower()] = {
            "summary": summary,
            "operationId": handler.__name__,
        }
    return {
        "openapi": "3.1.0",
        "info": {"title": "oscillink-tpu cloud", "version": __version__},
        "paths": paths,
        "components": {
            "schemas": {
                "SettleRequest": SettleRequest.model_json_schema(),
                "AutoCorrectRequest": AutoCorrectRequest.model_json_schema(),
                "CompetitorBenchRequest": CompetitorBenchRequest.model_json_schema(),
            }
        },
    }


def surface(schema: dict) -> set[tuple[str, str]]:
    return {
        (path, method)
        for path, ops in schema.get("paths", {}).items()
        for method in ops
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="openapi_baseline.json")
    p.add_argument("--check", action="store_true", help="diff against the baseline")
    args = p.parse_args(argv)

    schema = build_schema()
    if args.check:
        try:
            baseline = json.load(open(args.out))
        except FileNotFoundError:
            print(f"no baseline at {args.out}", file=sys.stderr)
            return 2
        removed = surface(baseline) - surface(schema)
        added = surface(schema) - surface(baseline)
        if removed:
            print("BREAKING: removed endpoints:", sorted(removed), file=sys.stderr)
            return 1
        print(json.dumps({"added": sorted(map(list, added)), "removed": []}))
        return 0
    with open(args.out, "w") as f:
        json.dump(schema, f, indent=2, sort_keys=True)
    print(f"wrote {args.out} ({len(schema['paths'])} paths)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
