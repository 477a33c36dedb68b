#!/bin/bash
# Serial sweep of bench.py serving configurations on the real TPU.
# Run manually on a quiet host (never concurrently with the driver's own
# bench run).  Results append to /tmp/bench_sweep_results.txt, one labeled
# JSON line per configuration.
#
# Configurations:
#   default      : int8 trunk + int8 Pallas layer1 chain (shipped default)
#   stem2        : + W8A8 second stem conv
#   int8head     : + int8-input fused head
#   uint8        : + raw-uint8 device-side normalization
#   all          : stem2 + int8head + uint8 together
#   bf16         : round-2 bf16 fast path (anchor)
set -u
cd "$(dirname "$0")/.."
OUT=${SWEEP_OUT:-/tmp/bench_sweep_results.txt}

run() {
  local label="$1"; shift
  echo "=== $label ($(date +%H:%M:%S)) ===" >> "$OUT"
  env "$@" timeout 900 python bench.py >> "$OUT" 2>/tmp/bench_sweep_err.log \
    || echo "{\"error\": \"$label failed, see /tmp/bench_sweep_err.log\"}" >> "$OUT"
}

run default
run stem2    BENCH_STEM2=1
run int8head BENCH_INT8HEAD=1
run uint8    BENCH_UINT8=1
run all      BENCH_STEM2=1 BENCH_INT8HEAD=1 BENCH_UINT8=1
run bf16     BENCH_BF16=1
echo "sweep done $(date +%H:%M:%S)" >> "$OUT"
