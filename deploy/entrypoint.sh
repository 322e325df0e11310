#!/bin/sh
# Licensed-container entrypoint (counterpart of reference cloud/entrypoint.sh):
# verify license -> export entitlements -> start usage flusher -> serve.
set -e

if [ -n "${OSCILLINK_LICENSE_REQUIRED}" ] && [ "${OSCILLINK_LICENSE_REQUIRED}" != "0" ]; then
    if [ -z "${OSCILLINK_LICENSE_FILE}" ] || [ -z "${OSCILLINK_JWKS_URL}" ]; then
        echo "licensed mode: OSCILLINK_LICENSE_FILE and OSCILLINK_JWKS_URL are required" >&2
        exit 1
    fi
    python -m oscillink_tpu.tools.license \
        --license-file "${OSCILLINK_LICENSE_FILE}" \
        --jwks-url "${OSCILLINK_JWKS_URL}" \
        --out "${OSCILLINK_ENTITLEMENTS_PATH:-/run/oscillink_entitlements.json}" \
        --env-out /run/oscillink_env.sh
    . /run/oscillink_env.sh
fi

if [ -n "${OSCILLINK_USAGE_LOG}" ] && [ -n "${OSCILLINK_USAGE_FLUSH_URL}" ]; then
    python -m oscillink_tpu.tools.usage_flush &
fi

# Persistent XLA compilation cache: without it every fresh process re-pays
# cold compiles (measured: 36 min for the 500k window-ctx program, 227 s for
# the 1M fast-scan build — benchmarks/NORTHSTAR.md). Mount a volume at this
# path to share compiles across restarts/replicas. Set to "" to disable.
export OSCILLINK_COMPILE_CACHE_DIR="${OSCILLINK_COMPILE_CACHE_DIR-/var/cache/oscillink/jax}"

# Serving routing policy: requests with N <= this threshold are settled by
# the C++ host engine when it is available (identical receipts/signatures),
# dodging the fixed per-request accelerator round-trip that dominates the
# small-N regime. Set to 0 to force every request onto the device path.
export OSCILLINK_NATIVE_SMALL_N="${OSCILLINK_NATIVE_SMALL_N:-2048}"

# Large-N routing: when the deployment has multiple accelerator devices,
# set OSCILLINK_SHARDED_MIN_N (and raise OSCILLINK_MAX_NODES with it) so
# requests above the threshold settle on the mesh-sharded tier — full
# signed receipts, identical state signatures (docs/SCALING.md). Left
# unset by default: single-chip deployments gain nothing from it.

exec python -m oscillink_tpu.service --host "${HOST:-0.0.0.0}" --port "${PORT:-8000}"
