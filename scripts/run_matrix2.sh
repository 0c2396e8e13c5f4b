#!/bin/bash
# Round-4 second matrix pass: the sections whose kernels were fixed
# since run_matrix.sh (stream2 K-major layout, wide bits int-iota).
set -u
LOG="${1:-/tmp/kernel_matrix2.log}"
cd "$(dirname "$0")/.."
echo "=== kernel matrix 2 start $(date -u) ===" >> "$LOG"

run() {
  local t="$1" s="$2"; shift 2
  echo "--- section $s $* ($(date -u +%H:%M:%S))" >> "$LOG"
  env "$@" timeout "$t" python scripts/kernel_matrix.py "$s" >> "$LOG" 2>&1
  echo "--- rc=$? section $s ($(date -u +%H:%M:%S))" >> "$LOG"
}

run 900 stream200
run 700 widebits47
run 500 stream2knobs CLIVE2_STREAM_ROWS=48 CLIVE2_STREAM_NBUF=8
run 500 stream2knobs CLIVE2_STREAM_ROWS=48 CLIVE2_STREAM_NBUF=8 CLIVE2_STREAM_OCC=0
run 500 stream2knobs CLIVE2_STREAM_ROWS=16 CLIVE2_STREAM_NBUF=8
run 900 sponza
echo "=== kernel matrix 2 done $(date -u) ===" >> "$LOG"
