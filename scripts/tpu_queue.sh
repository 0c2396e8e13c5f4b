#!/bin/bash
# Round-3 TPU work queue: poll the axon backend until it serves a chip,
# then run the consolidated hardware session (tpu_session.sh).  If the
# session aborts because the chip flapped away mid-run (rc=98), resume
# polling and re-run it on the next up-window: steps that already passed
# are skipped via their DONE markers in the log, and tune_from_session
# is idempotent over the accumulated log, so a flapping chip still
# eventually yields the full measurement record.
# One process owns the chip at a time (see deployment notes); this
# script is the only thing that should touch the TPU while it runs.
#
# Usage: bash scripts/tpu_queue.sh [max_poll_minutes]
set -u
cd "$(dirname "$0")/.."
MAXMIN=${1:-360}
LOG=/tmp/tpu_queue.log
echo "=== tpu_queue start $(date)" >> "$LOG"

deadline=$(( $(date +%s) + MAXMIN * 60 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  if timeout 120 python -c "
import jax
d = jax.devices()
assert d[0].platform != 'cpu', d
print('TPU:', d)
" >> "$LOG" 2>&1; then
    echo "=== TPU up $(date); running tpu_session.sh" >> "$LOG"
    bash scripts/tpu_session.sh "$LOG"
    rc=$?
    echo "=== tpu_session rc=$rc $(date)" >> "$LOG"
    if [ "$rc" -eq 98 ]; then
      echo "=== session aborted (chip lost); resuming poll" >> "$LOG"
      sleep 150
      continue
    fi
    exit $rc
  fi
  echo "--- still down $(date)" >> "$LOG"
  sleep 150
done
echo "=== gave up after ${MAXMIN}m $(date)" >> "$LOG"
exit 99
