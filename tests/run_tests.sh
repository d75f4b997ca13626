#!/usr/bin/env bash
# Run the suite with the axon TPU plugin fully bypassed: compilations stay
# local (the remote-compile relay serialises across processes and adds
# minutes of latency when contended).
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then
    set -- tests/ -q
fi
exec env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE -u AXON_LOOPBACK_RELAY \
    JAX_PLATFORMS=cpu python -m pytest "$@"
