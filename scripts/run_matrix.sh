#!/bin/bash
# Drive kernel_matrix.py section-by-section (each in its own process so a
# TPU fault only loses one section).  Appends JSON rows to $1
# (default /tmp/kernel_matrix.log).  Sections ordered by information
# value: the never-measured stream2 first, then the wide-variant
# decisions, then baselines, knobs, and the big sponza mesh last.
set -u
LOG="${1:-/tmp/kernel_matrix.log}"
cd "$(dirname "$0")/.."
echo "=== kernel matrix start $(date -u) ===" >> "$LOG"

run() {  # run <timeout_s> <section> [ENV=VAL ...]
  local t="$1" s="$2"; shift 2
  echo "--- section $s $* ($(date -u +%H:%M:%S))" >> "$LOG"
  env "$@" timeout "$t" python scripts/kernel_matrix.py "$s" >> "$LOG" 2>&1
  echo "--- rc=$? section $s ($(date -u +%H:%M:%S))" >> "$LOG"
}

run 900 stream200
run 700 wide47
run 700 widebits47
run 400 pallas2_6k
run 400 gather47
run 500 stream2knobs CLIVE2_STREAM_ROWS=48 CLIVE2_STREAM_NBUF=8
run 500 stream2knobs CLIVE2_STREAM_ROWS=48 CLIVE2_STREAM_NBUF=8 CLIVE2_STREAM_OCC=1
run 500 stream2knobs CLIVE2_STREAM_ROWS=32 CLIVE2_STREAM_NBUF=8
run 900 sponza
echo "=== kernel matrix done $(date -u) ===" >> "$LOG"
