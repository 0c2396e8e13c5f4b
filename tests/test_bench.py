"""bench.py orchestration tests (no renders — subprocess layer patched).

The driver records BENCH_r{N}.json from ``python bench.py``; the round-2
artifact was truncated (rc=124) because one config overran the budget.
These tests pin the budget logic: every config gets a row, the parent
exits 0, and configs that finish early donate their unspent budget to
later configs (surplus rolling) without raising the worst-case total.
"""

import json
import types

import bench


class _FakeCompleted:
    returncode = 0
    stdout = ""
    stderr = ""


def _run_main(monkeypatch, capsys, configs, child=None):
    captured = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        captured.append(dict(env=env, timeout=timeout))
        if child is not None:
            return child(env, timeout)
        return _FakeCompleted()

    monkeypatch.setattr(bench, "_tpu_available", lambda *a, **k: "axon")
    monkeypatch.setattr(bench, "_takeover_chip", lambda *a, **k: False)
    monkeypatch.setattr(bench, "_ensure_assets", lambda: None)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("BENCH_CONFIGS", ",".join(configs))
    monkeypatch.delenv("BENCH_NO_FORK", raising=False)
    monkeypatch.delenv("BENCH_TIME_BUDGET", raising=False)
    bench.main()
    return captured, capsys.readouterr().out


def test_surplus_rolls_to_later_configs(monkeypatch, capsys):
    cfgs = ["cornell_256", "teapots_512", "sponza_1080p"]
    captured, _ = _run_main(monkeypatch, capsys, cfgs)
    # instant children: each later config's budget grows by the full
    # unspent budget of everything before it
    b = bench.BUDGETS
    assert captured[0]["timeout"] <= b["cornell_256"] + 1e-6
    assert captured[1]["timeout"] > b["teapots_512"]  # got cornell's surplus
    assert captured[2]["timeout"] > b["sponza_1080p"] + b["teapots_512"]
    # worst-case total is preserved: sum of granted budgets with instant
    # children never exceeds... (granted_i <= own + all prior unspent)
    assert captured[2]["timeout"] <= sum(b[c] for c in cfgs) + 1e-6
    # the child is told its effective budget (formatted to 0.1 s)
    for c in captured:
        assert abs(float(c["env"]["BENCH_BUDGET_OVERRIDE"])
                   - c["timeout"]) < 0.1


def test_every_config_gets_a_row_on_timeout(monkeypatch, capsys):
    # simulated clock: a timed-out child burns its whole budget, so it
    # must donate NO surplus to the next config
    clock = [0.0]
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock[0])

    def child(env, timeout):
        clock[0] += timeout
        raise bench.subprocess.TimeoutExpired(cmd="x", timeout=timeout)

    cfgs = ["cornell_256", "movie_720p"]
    captured, out = _run_main(monkeypatch, capsys, cfgs, child=child)
    rows = [json.loads(line) for line in out.strip().splitlines()]
    cfg_rows = [r for r in rows if r.get("metric") in cfgs]
    assert [r["metric"] for r in cfg_rows] == cfgs
    assert all(r["value"] is None and r["unit"] == "timeout"
               for r in cfg_rows)
    # a config that burns its whole budget donates nothing
    assert captured[1]["timeout"] <= bench.BUDGETS["movie_720p"] + 1.0
    # the run ends with ONE summary line re-emitting every row, so tail
    # truncation of the driver artifact cannot lose the early rows
    assert rows[-1]["metric"] == "bench_summary"
    assert [r["metric"] for r in rows[-1]["rows"]] == cfgs


def test_timeout_recovers_provisional_row(monkeypatch, capsys):
    """A child that emitted phase marks + a provisional row before its
    timeout leaves a PARTIAL measurement, not a bare timeout (VERDICT r3
    next-round #1a: 'a hang in any single device call leaves a bare
    timeout row with zero diagnostic content')."""
    child_out = "\n".join([
        json.dumps({"metric": "cornell_256x256", "phase": "scene_build",
                    "t": 1.0}),
        json.dumps({"metric": "cornell_256x256", "phase": "warmup",
                    "t": 9.0}),
        json.dumps({"metric": "cornell_256x256", "value": 41.5,
                    "unit": "Mrays/s", "vs_baseline": None, "samples": 3,
                    "provisional": True}),
    ]) + "\n"

    def child(env, timeout):
        raise bench.subprocess.TimeoutExpired(
            cmd="x", timeout=timeout, output=child_out.encode(),
            stderr=b"")

    _, out = _run_main(monkeypatch, capsys, ["cornell_256"], child=child)
    rows = [json.loads(line) for line in out.strip().splitlines()
            if line.startswith("{")]
    final = [r for r in rows if r.get("partial")]
    assert len(final) == 1
    assert final[0]["value"] == 41.5          # provisional value recovered
    assert final[0]["unit"] == "timeout"
    assert final[0]["last_phase"]["phase"] == "warmup"


def test_canary_failure_stamps_later_rows(monkeypatch, capsys):
    """If the 64x64 mesh canary can't finish, every later failing row is
    stamped with the canary diagnosis (VERDICT r3 next-round #1d)."""
    def child(env, timeout):
        raise bench.subprocess.TimeoutExpired(cmd="x", timeout=timeout)

    _, out = _run_main(monkeypatch, capsys,
                       ["canary_64", "dragon_512"], child=child)
    rows = [json.loads(line) for line in out.strip().splitlines()
            if line.startswith("{")]
    dragon = [r for r in rows if r.get("metric") == "dragon_512"]
    assert dragon and dragon[0]["canary"] == "failed"


def test_backend_down_emits_error_rows(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_tpu_available", lambda *a, **k: False)
    monkeypatch.setattr(
        bench, "_ensure_assets",
        lambda: (_ for _ in ()).throw(AssertionError("must not run")),
    )
    monkeypatch.setenv("BENCH_CONFIGS", "cornell_256,sponza_1080p")
    bench.main()
    rows = [json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 2
    assert all(r["unit"] == "error" for r in rows)


def test_takeover_called_only_on_device_platform(monkeypatch, capsys):
    """The driver's end-of-round bench preempts the repo's own unattended
    TPU session (they cannot share the chip) — but never on a
    CPU-platform jax, where the session can't be holding a chip."""
    calls = []
    monkeypatch.setattr(bench, "_takeover_chip",
                        lambda *a, **k: calls.append(1) or True)
    monkeypatch.setattr(bench, "_ensure_assets", lambda: None)
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: _FakeCompleted())
    monkeypatch.setenv("BENCH_CONFIGS", "cornell_256,teapots_512")
    monkeypatch.delenv("BENCH_NO_FORK", raising=False)

    monkeypatch.setattr(bench, "_tpu_available", lambda *a, **k: "cpu")
    bench.main()
    assert calls == []

    monkeypatch.setattr(bench, "_tpu_available", lambda *a, **k: "axon")
    bench.main()
    assert calls == [1]


def test_takeover_refuses_unverified_pid(monkeypatch, tmp_path):
    """Pid files can be stale and pids get reused: _takeover_chip must
    only signal a pid whose /proc cmdline proves it is one of our queue
    scripts.  Pointing it at THIS live process (a pytest, not a
    tpu_*.sh) must be a no-op."""
    import os

    pf = tmp_path / "owner.pid"
    pf.write_text(str(os.getpid()))
    monkeypatch.setattr(bench, "_CHIP_OWNER_PIDFILES", (str(pf),))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("CLIVE2_SESSION_OWNER", raising=False)
    assert bench._takeover_chip() is False   # alive pid, wrong cmdline


def test_takeover_skips_inside_session(monkeypatch):
    monkeypatch.setenv("CLIVE2_SESSION_OWNER", "1")
    assert bench._takeover_chip() is False


def test_maybe_aot_disabled_returns_jitted(monkeypatch):
    monkeypatch.setenv("BENCH_AOT_CACHE", "0")
    sentinel = object()
    assert bench._maybe_aot(sentinel, (), salt="x") is sentinel


def test_maybe_aot_compiles_then_loads(tmp_path):
    """First run serializes the executable, a second process loads it —
    the mechanism that lets the unattended session's benches warm the
    driver's end-of-round run.  Runs in single-device subprocesses: the
    suite's 8-virtual-device env doesn't match the serialized 1-device
    executable (production bench always sees one chip)."""
    import os
    import subprocess
    import sys

    snippet = (
        "import jax, jax.numpy as jnp, bench;"
        "f = jax.jit(lambda x: x * 2.0);"
        "g = bench._maybe_aot(f, (jnp.float32(3.0),), salt='test');"
        "assert float(g(jnp.float32(3.0))) == 6.0"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               BENCH_AOT_CACHE=str(tmp_path),
               PYTHONPATH=os.path.dirname(bench.__file__))
    outs = []
    for _ in range(2):
        r = subprocess.run([sys.executable, "-c", snippet], env=env,
                           capture_output=True, text=True, timeout=120,
                           cwd=os.path.dirname(bench.__file__))
        assert r.returncode == 0, r.stderr
        outs.append(r.stderr)
    assert "aot compiled [test]" in outs[0]
    assert "aot loaded [test]" in outs[1]
    assert list(tmp_path.glob("*.pkl")), "executable not serialized"
