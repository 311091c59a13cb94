#!/usr/bin/env bash
# One-shot on-chip revalidation after a TPU tunnel outage (or any time):
#   1. the chip-gated hardware tests (sampler chi^2, seed determinism,
#      Pallas-vs-scan parity, int8 tracking, fused-kernel loss parity,
#      device-Harvest agreement)
#   2. the device-Harvest throughput probe (README numbers)
#   3. bench.py twice (cross-run chip/tunnel state varies; keep both)
# Each stage is bounded so a half-dead tunnel cannot wedge the run, and
# every stage's status folds into the exit code (a wholesale test
# failure must not read as a successful revalidation).
set -uo pipefail
cd "$(dirname "$0")/.."
status=0

echo "== 0. device probe =="
timeout 600 python -c "import jax; print(jax.devices())" || {
    echo "TPU unavailable; aborting."; exit 1; }

echo "== 1. chip-gated hardware tests =="
WN_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu_hardware.py \
    -v 2>&1 | tail -40
[ "${PIPESTATUS[0]}" -eq 0 ] || { echo "STAGE 1 FAILED"; status=1; }

echo "== 2. device-Harvest throughput probe =="
timeout 3600 python scripts/harvest_device_probe.py 2>&1 | tail -20
[ "${PIPESTATUS[0]}" -eq 0 ] || { echo "STAGE 2 FAILED"; status=1; }

echo "== 3. bench (two separated rounds) =="
timeout 3600 python bench.py || { echo "STAGE 3a FAILED"; status=1; }
sleep 30
timeout 3600 python bench.py || { echo "STAGE 3b FAILED"; status=1; }

exit "$status"
