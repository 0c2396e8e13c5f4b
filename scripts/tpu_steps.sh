# Step machinery for the unattended TPU hardware session — sourced by
# scripts/tpu_session.sh (and by tests/test_session_steps.py, which
# drives it with stubbed probes).  Expects $LOG to be set by the
# sourcer.
#
# Contract:
#   step <timeout> <cmd...>  — run cmd with the wall timeout, logging
#     START/rc/DONE markers.  The START marker embeds the CLIVE2_* /
#     BENCH_* / STEP_TAG env so tune_from_session can tell A/B sections
#     apart.  A step whose exact (env, cmd) already has a green DONE
#     marker in $LOG is SKIPPED — this makes the session resumable
#     across chip flaps (tpu_queue.sh re-runs the session on the next
#     up-window and only the unfinished steps execute).
#     tune_from_session steps are never skipped: they re-parse the
#     accumulated log.
#   On a failing step, probe_chip decides between "the step failed but
#   the chip is alive" (continue — e.g. a bench overran its budget) and
#   "the chip flapped away" (abort_session: deploy the flips the
#   partial log earned, persist the log, exit 98 so the queue resumes
#   polling).  Without the abort, every remaining step would burn its
#   full timeout against a dead backend — ~10h of wall for a full
#   session.

probe_chip() {
  timeout 120 python -c "
import jax
assert jax.devices()[0].platform != 'cpu'
" >> "$LOG" 2>&1
}

abort_session() {
  # CPU env for the tuner: importing jax through the axon sitecustomize
  # can hang at interpreter start while the backend is down.
  echo "=== SESSION ABORTED (chip lost) ($(date))" >> "$LOG"
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo timeout 120 \
    python scripts/tune_from_session.py "$LOG" >> "$LOG" 2>&1
  cp "$LOG" docs/tpu_session_round3.log 2>/dev/null || true
  exit 98
}

step() {
  local t=$1; shift
  local marker key rc
  marker="$(env | grep -E '^(CLIVE2_|BENCH_|STEP_TAG)' | sort | tr '\n' ' ')"
  key=$(printf '%s|%s' "$marker" "$*" | md5sum | cut -c1-12)
  if [[ "$*" != *tune_from_session* ]] \
      && grep -q "=== DONE\[$key\] rc=0" "$LOG" 2>/dev/null; then
    echo "=== SKIP [$marker] $* (already green) ($(date))" >> "$LOG"
    return 0
  fi
  echo "=== START [$marker] $* ($(date))" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== rc=$rc $* ($(date))" >> "$LOG"
  echo "=== DONE[$key] rc=$rc $* ($(date))" >> "$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_chip || abort_session
  fi
  return 0
}
