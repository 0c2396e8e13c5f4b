#!/bin/bash
# Keep the TPU work queue alive until a hardware session has run TO
# COMPLETION: restart the queue whenever it dies — poll budget expired
# (rc=99), a mid-flap abort path ran out of budget, or an unexpected
# crash — as long as the log shows no "SESSION DONE".  The driver's
# end-of-round bench preempts unattended work by killing THIS process
# first (bench._takeover_chip reads /tmp/tpu_supervisor.pid before the
# queue/session pidfiles), so the restart loop can never race the bench.
#
# Usage: bash scripts/tpu_supervisor.sh <queue_pid> [requeue_minutes]
set -u
cd "$(dirname "$0")/.."
QPID=${1:?queue pid}
REQMIN=${2:-1200}
LOG=/tmp/tpu_queue.log
RESTARTS=0

while true; do
  while kill -0 "$QPID" 2>/dev/null; do
    sleep 60
  done
  if grep -q "SESSION DONE" "$LOG" 2>/dev/null; then
    echo "supervisor: a full session completed; exiting" >> "$LOG"
    exit 0
  fi
  if [ "$RESTARTS" -ge 50 ]; then
    echo "supervisor: restart cap reached; exiting" >> "$LOG"
    exit 1
  fi
  RESTARTS=$((RESTARTS + 1))
  echo "supervisor: queue $QPID gone without a completed session;" \
       "restart #$RESTARTS" >> "$LOG"
  setsid nohup bash scripts/tpu_queue.sh "$REQMIN" >> "$LOG" 2>&1 &
  QPID=$!
  echo "$QPID" > /tmp/tpu_queue.pid
  sleep 60
done
