#!/usr/bin/env bash
# Run the test suite on a simulated 8-device CPU mesh (no TPU needed).
# The axon sitecustomize locks the backend before conftest can choose one, so
# the platform env must be set before Python starts and the axon pool var
# unset (see tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -q "$@"
