"""Orchestration tests for the unattended TPU session's step machinery
(scripts/tpu_steps.sh): resumable steps (green DONE markers skip),
env-keyed A/B disambiguation, and chip-flap early abort.

The axon backend flaps for multi-hour stretches (outage record in the
deployment notes), so the hardware session must (a) survive losing the
chip mid-run without burning every remaining step's timeout, and
(b) resume on the next up-window re-running only the unfinished steps.
These tests drive the real bash functions with stubbed chip probes —
no jax, no TPU, no renders.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = os.path.join(REPO, "scripts", "tpu_steps.sh")


def run_harness(tmp_path, body, probe="true"):
    """Source tpu_steps.sh in a scratch cwd with probe_chip stubbed,
    run ``body``, and return (rc, log_text)."""
    log = tmp_path / "session.log"
    log.touch()
    script = tmp_path / "harness.sh"
    script.write_text(
        "set -u\n"
        f"cd {tmp_path}\n"
        f"LOG={log}\n"
        f". {STEPS}\n"
        f"probe_chip() {{ {probe}; }}\n"
        + body
    )
    r = subprocess.run(["bash", str(script)], capture_output=True,
                       text=True, timeout=120)
    return r.returncode, log.read_text()


def test_green_step_skipped_on_resume(tmp_path):
    body = (
        "step 10 bash -c 'echo PAYLOAD-RAN'\n"
        "step 10 bash -c 'echo PAYLOAD-RAN'\n"
    )
    rc, log = run_harness(tmp_path, body)
    assert rc == 0
    assert log.splitlines().count("PAYLOAD-RAN") == 1
    assert "=== SKIP" in log and "(already green)" in log


def test_failed_step_reruns_on_resume(tmp_path):
    # rc!=0 steps get a DONE marker with their rc but are NOT skipped
    # next time (probe stubbed alive so the failure doesn't abort)
    body = (
        "step 10 bash -c 'echo TRY; exit 3'\n"
        "step 10 bash -c 'echo TRY; exit 3'\n"
    )
    rc, log = run_harness(tmp_path, body)
    assert rc == 0
    assert log.splitlines().count("TRY") == 2
    assert "=== SKIP" not in log


def test_env_knobs_distinguish_steps(tmp_path):
    # same command under different CLIVE2_/BENCH_/STEP_TAG env = a
    # different step (A/B sections must each run)
    body = (
        "CLIVE2_X=1 step 10 bash -c 'echo PAYLOAD-RAN'\n"
        "CLIVE2_X=2 step 10 bash -c 'echo PAYLOAD-RAN'\n"
        "BENCH_CONFIGS=a step 10 bash -c 'echo PAYLOAD-RAN'\n"
        "STEP_TAG=posttune step 10 bash -c 'echo PAYLOAD-RAN'\n"
    )
    rc, log = run_harness(tmp_path, body)
    assert rc == 0
    assert log.splitlines().count("PAYLOAD-RAN") == 4
    assert "=== SKIP" not in log
    # the marker embeds the knobs for tune_from_session's A/B parsing
    assert "CLIVE2_X=1" in log and "BENCH_CONFIGS=a" in log
    assert "STEP_TAG=posttune" in log


def test_tune_steps_never_skipped(tmp_path):
    (tmp_path / "scripts").mkdir()
    (tmp_path / "scripts" / "tune_from_session.py").write_text(
        "print('TUNER-RAN')\n")
    body = (
        "step 10 python scripts/tune_from_session.py x\n"
        "step 10 python scripts/tune_from_session.py x\n"
    )
    rc, log = run_harness(tmp_path, body)
    assert rc == 0
    assert log.count("TUNER-RAN") == 2


def test_failure_with_live_chip_continues(tmp_path):
    body = (
        "step 10 bash -c 'exit 7'\n"
        "step 10 bash -c 'echo AFTER-FAILURE'\n"
        "echo '=== SESSION DONE' >> \"$LOG\"\n"
    )
    rc, log = run_harness(tmp_path, body, probe="true")
    assert rc == 0
    assert "AFTER-FAILURE" in log
    assert "SESSION DONE" in log
    assert "ABORTED" not in log


def test_failure_with_dead_chip_aborts(tmp_path):
    # dead probe => abort_session: rc=98 (tpu_queue resumes polling),
    # the partial log is tuned (stub tuner proves the invocation), and
    # no later step runs
    (tmp_path / "scripts").mkdir()
    (tmp_path / "scripts" / "tune_from_session.py").write_text(
        "import sys; print('TUNER-RAN on', sys.argv[1])\n")
    (tmp_path / "docs").mkdir()
    body = (
        "step 10 bash -c 'exit 7'\n"
        "step 10 bash -c 'echo AFTER-FAILURE'\n"
    )
    rc, log = run_harness(tmp_path, body, probe="false")
    assert rc == 98
    assert "=== SESSION ABORTED (chip lost)" in log
    assert "TUNER-RAN" in log
    assert "AFTER-FAILURE" not in log
    # the durable in-repo copy for the judge/next round
    assert (tmp_path / "docs" / "tpu_session_round3.log").exists()


def test_timeout_counts_as_failure_and_aborts_on_dead_chip(tmp_path):
    (tmp_path / "scripts").mkdir()
    (tmp_path / "scripts" / "tune_from_session.py").write_text("pass\n")
    body = "step 1 sleep 30\n"
    rc, log = run_harness(tmp_path, body, probe="false")
    assert rc == 98
    assert "=== rc=124 sleep 30" in log


@pytest.mark.parametrize("script", ["tpu_session.sh", "tpu_queue.sh",
                                    "tpu_supervisor.sh", "tpu_steps.sh"])
def test_scripts_parse(script):
    r = subprocess.run(["bash", "-n", os.path.join(REPO, "scripts", script)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
