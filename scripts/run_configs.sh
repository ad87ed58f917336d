#!/usr/bin/env bash
# Run the five BASELINE.json workload configs end-to-end on the current
# backend and append each JSON summary line to RESULTS.md (VERDICT r2 item 2).
# Every CLI already stamps dataset provenance into its JSON line.
#
# Usage: bash scripts/run_configs.sh [outfile]
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-RESULTS.md}"
PY=python

run() {
  local name="$1"; shift
  echo "== $name: $*" >&2
  local t0=$SECONDS
  local line rc
  line=$("$PY" -m dropout_hamiltonian_montecarlo_tpu.cli "$@" 2>"/tmp/cfg_err_${name}.log" | tail -1)
  rc=$?   # with pipefail: the python status unless tail itself fails
  local dt=$((SECONDS - t0))
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    echo "   FAILED (rc=$rc, ${dt}s); stderr tail:" >&2
    tail -5 "/tmp/cfg_err_${name}.log" >&2
    echo "- **$name** (wall ${dt}s): FAILED rc=$rc" >> "$OUT"
  else
    echo "   ok (${dt}s)" >&2
    echo "- **$name** (wall ${dt}s): \`$line\`" >> "$OUT"
  fi
}

{
  echo "# RESULTS — BASELINE.json configs, $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo
  "$PY" - <<'EOF'
import jax
print(f"Backend: {jax.default_backend()} ({jax.devices()})")
EOF
  echo
} > "$OUT"

# config 1: 2D MVN target, HMC (CPU-runnable reference scenario)
run config1-mvn-hmc mvn-hmc --dim 2 --chains 4 --samples 1000 --warmup 300

# config 2: Bayesian logistic regression on simulated blobs, 32 chains
run config2-logistic-hmc logistic-hmc --chains 32 --samples 1000 --warmup 300

# config 3: MNIST softmax, full-batch NUTS (Kron metric), 128 chains.
# Streaming chunks keep each device program short and the draw buffer
# bounded: the monolithic warmup+sampling program at this scale faults the
# tunneled chip (observed UNAVAILABLE device error), the chunked one runs.
run config3-mnist-nuts mnist-nuts --chains 128 --samples 200 --warmup 100 \
    --max-depth 6 --save /tmp/config3_samples.h5 --stream-chunk 25

# config 4: MNIST dropout MLP, SGHMC minibatch (dropout IN the potential)
run config4-mlp-sghmc mnist-mlp-sgmcmc --algorithm sghmc

# config 4b: same with SGLD.  Step 1e-6, not the SGHMC default 1e-5: SGLD
# has no friction term damping the n-scaled gradient, and 1e-5 diverges the
# chain off the SGD mode (observed: posterior-mean train acc 0.10).
run config4b-mlp-sgld mnist-mlp-sgmcmc --algorithm sgld --step-size 1e-6

# config 5: PlantVillage conv-feature classifier, tempered SMC
run config5-plantvillage-smc plantvillage-smc --particles 256 --n-data 5000

echo >> "$OUT"
echo "Wrote $OUT" >&2
