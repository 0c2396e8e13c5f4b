#!/bin/bash
# Keep the TPU work queue alive across its own poll budget: if
# tpu_queue.sh gives up (rc=99 after max_poll_minutes) without ever
# having run the hardware session, start a fresh queue.  Exits once a
# session has run (a "tpu_session rc=" line appears in the queue log).
#
# Usage: bash scripts/tpu_supervisor.sh <queue_pid> [requeue_minutes]
set -u
cd "$(dirname "$0")/.."
QPID=${1:?queue pid}
REQMIN=${2:-1200}
LOG=/tmp/tpu_queue.log

while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
if grep -q "tpu_session rc=" "$LOG" 2>/dev/null; then
  echo "supervisor: session already ran; exiting" >> "$LOG"
  exit 0
fi
echo "supervisor: queue $QPID gone without a session; restarting" >> "$LOG"
exec bash scripts/tpu_queue.sh "$REQMIN"
