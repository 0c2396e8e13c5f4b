"""Traversal-path dispatch tests (scene.py:246-336).

The dispatcher only exercises the Pallas branches when _on_tpu() is
true, so the CPU suite never covered the selection logic (budget math,
wide fallback, streaming blocks_per_leaf coarsening, impl pick).  These
tests monkeypatch _on_tpu and shrink the SMEM/VMEM budgets so every
branch is reachable with a small procedural scene — the selection runs
for real (packing included); only kernel execution is out of scope here
(covered by tests/test_pallas_kernels.py in interpret mode).
"""

import numpy as np
import pytest

import clive2_tpu.scene as scene_mod
from clive2_tpu.geometry import TriangleSoup
from clive2_tpu.scene import create_scene


def _blob(n_tris, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (n_tris, 1, 3))
    tris = centers + rng.uniform(-0.1, 0.1, (n_tris, 3, 3))
    return TriangleSoup.from_vertices(tris.astype(np.float32))


KEYS = ("brute_pallas", "brute", "pallas", "wide", "stream", "stream2")


def _selected(scene):
    return [k for k in KEYS if k in scene.data]


def _make(monkeypatch, n_tris, smem=None, vmem=None, env=None):
    monkeypatch.setattr(scene_mod, "_on_tpu", lambda: True)
    if smem is not None:
        monkeypatch.setattr(scene_mod, "PALLAS_SMEM_BUDGET", smem)
    if vmem is not None:
        monkeypatch.setattr(scene_mod, "PALLAS_VMEM_BUDGET", vmem)
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    return create_scene(pixel_width=32, pixel_height=32,
                        extra_geometry=_blob(n_tris))


def test_small_scene_takes_brute_pallas(monkeypatch):
    s = _make(monkeypatch, 10)
    assert _selected(s) == ["brute_pallas"]


def test_mid_scene_takes_binary_packet_kernel(monkeypatch):
    s = _make(monkeypatch, 3000)
    assert _selected(s) == ["pallas"]


def test_past_binary_smem_falls_to_stream2(monkeypatch):
    # shrink SMEM so the 3k scene exceeds the binary kernel's budget:
    # the dispatcher now goes STRAIGHT to the streaming kernel — the
    # wide kernel measured 0.38-0.43 Mrays/s in its former 100-150k
    # window on hardware (round 4), ~10x under stream2, so it is
    # A/B-only (CLIVE2_TRAVERSAL=wide)
    s = _make(monkeypatch, 3000, smem=24 * 1024)
    assert _selected(s) == ["stream2"]


def test_past_wide_vmem_falls_to_stream(monkeypatch):
    # the default streaming impl is the MXU kernel (stream2) since the
    # 2026-08-20 hardware flip (see scene.py dispatch comment)
    s = _make(monkeypatch, 3000, smem=24 * 1024, vmem=64 * 1024)
    assert _selected(s) == ["stream2"]


def test_padded_over_budget_repacks_compact(monkeypatch):
    """A budget between the compact and padded leaf-table sizes must
    select the wide kernel with the compact 12-slot layout (the marker
    entry pack_bvh8 writes), not fall through to streaming."""
    from clive2_tpu.bvh.build import build_bvh
    from clive2_tpu.ops import traverse_wide as tw

    blob = _blob(3000)
    # budget between the two layouts' footprints for THIS scene (world =
    # blob + cornell box; approximate with the blob alone plus slack)
    bvh = build_bvh(blob)
    hi = tw.vmem_bytes(tw.pack_bvh8(bvh, blob))
    lo = tw.vmem_bytes(tw.pack_bvh8(bvh, blob, compact=True))
    assert lo < hi
    s = _make(monkeypatch, 3000, smem=24 * 1024, vmem=(lo + hi) // 2,
              env={"CLIVE2_TRAVERSAL": "wide"})
    assert _selected(s) == ["wide"]
    assert "compact" in s.data["wide"]


def test_wide_compact_env_forces_layout(monkeypatch):
    s = _make(monkeypatch, 3000, smem=24 * 1024,
              env={"CLIVE2_TRAVERSAL": "wide", "CLIVE2_WIDE_COMPACT": "1"})
    assert _selected(s) == ["wide"]
    assert "compact" in s.data["wide"]


def test_stream_impl2_env_selects_mxu_kernel(monkeypatch):
    s = _make(monkeypatch, 3000, smem=24 * 1024, vmem=64 * 1024,
              env={"CLIVE2_STREAM_IMPL": "2"})
    assert _selected(s) == ["stream2"]


def test_stream_coarsens_blocks_per_leaf_to_fit_smem(monkeypatch):
    # with a tiny SMEM budget the bpl=1 top tree cannot fit; the
    # dispatcher must coarsen until it does rather than give up
    # (stream2's K-major blocks are [n_fat, KDIM, GROUPS*cols])
    from clive2_tpu.ops import traverse_stream2 as ts2

    s = _make(monkeypatch, 3000, smem=1024, vmem=64 * 1024)
    assert _selected(s) == ["stream2"]
    cols = s.data["stream2"]["leafblocks"].shape[2] // ts2.GROUPS
    assert cols > 128, f"expected coarsened fat leaves, got cols={cols}"


def test_force_env_overrides_dispatch(monkeypatch):
    s = _make(monkeypatch, 3000, env={"CLIVE2_TRAVERSAL": "wide"})
    assert _selected(s) == ["wide"]


def test_tuned_file_flips_stream_impl(monkeypatch, tmp_path):
    """A hardware-validation session records winning kernel variants in
    tuned.json (utils/tuned.py); when the env knob is unset the
    dispatcher must honor it — and an explicit env knob must win."""
    p = tmp_path / "tuned.json"
    p.write_text('{"stream_impl": "2"}')
    monkeypatch.setenv("CLIVE2_TUNED", "1")
    monkeypatch.setenv("CLIVE2_TUNED_PATH", str(p))
    s = _make(monkeypatch, 3000, smem=24 * 1024, vmem=64 * 1024)
    assert _selected(s) == ["stream2"]
    s = _make(monkeypatch, 3000, smem=24 * 1024, vmem=64 * 1024,
              env={"CLIVE2_STREAM_IMPL": "1", "CLIVE2_STREAM1_FORCE": "1"})
    assert _selected(s) == ["stream"]


def test_stream1_is_fenced_without_force(monkeypatch):
    """stream1 faults on TPU inside production BDPT programs at 202k+
    tris (round-4 hardware), so selecting it must require an explicit
    CLIVE2_STREAM1_FORCE=1 ack and otherwise fall back to stream2."""
    with pytest.warns(UserWarning, match="fenced"):
        s = _make(monkeypatch, 3000, smem=24 * 1024, vmem=64 * 1024,
                  env={"CLIVE2_STREAM_IMPL": "1"})
    assert _selected(s) == ["stream2"]


def test_tune_from_session_decisions(tmp_path, monkeypatch):
    """The unattended tuner must flip only on correctness + a win."""
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    tfs = importlib.import_module("tune_from_session")

    win_log = "\n".join([
        "=== START python scripts/val_tpu_round3.py all (date)",
        "stream2 coherent: id match 100.00%  hitrate 0.9/0.9  (first 5s)",
        "stream2 incoherent: id match 100.00%  hitrate 0.6/0.6",
        "wide47k coherent:    10.0 ms ->  20.00 Mrays/s",
        "wide47k incoherent:  20.0 ms ->  10.00 Mrays/s",
        "wide47k-gate coherent: id match 100.00%  hitrate 0.9/0.9",
        "wide47k-gate incoherent: id match 100.00%  hitrate 0.6/0.6",
        "wide47k-gate coherent:     8.0 ms ->  25.00 Mrays/s",
        "wide47k-gate incoherent:  16.0 ms ->  12.50 Mrays/s",
        # the IMPL=2 A/B subset (step() embeds CLIVE2_* env in the header)
        "=== START [CLIVE2_STREAM_IMPL=2 ] python bench.py (date)",
        '{"metric": "sponza_1.3Mtris_1920x1080", "value": 2.5, "unit": "Mrays/s"}',
        '{"metric": "glass_dragon_871k_512x512", "value": 3.0, "unit": "Mrays/s"}',
        # the wave-order A/B (raster loses to the morton default here)
        "=== START [CLIVE2_WAVE_ORDER=raster ] python bench.py (date)",
        '{"metric": "sponza_1.3Mtris_1920x1080", "value": 0.2, "unit": "Mrays/s"}',
        '{"metric": "glass_dragon_871k_512x512", "value": 2.0, "unit": "Mrays/s"}',
        "=== START [] python bench.py (date)",     # the default full run
        '{"metric": "cornell_256x256", "value": 120.0, "unit": "Mrays/s"}',
        '{"metric": "sponza_1.3Mtris_1920x1080", "value": 0.3, "unit": "Mrays/s"}',
        '{"metric": "glass_dragon_871k_512x512", "value": 2.9, "unit": "Mrays/s"}',
    ])
    assert tfs.decide(win_log) == {"wide_gate": "1", "stream_impl": "2"}

    # correctness gate failed -> no flip, whatever the bench says
    lose = win_log.replace("stream2 incoherent: id match 100.00%",
                           "stream2 incoherent: id match 99.10%")
    assert "stream_impl" not in tfs.decide(lose)

    # gate slower incoherent -> wide_gate not flipped
    slower = win_log.replace("wide47k-gate incoherent:  16.0 ms ->  "
                             "12.50 Mrays/s",
                             "wide47k-gate incoherent:  26.0 ms ->  "
                             "7.50 Mrays/s")
    assert "wide_gate" not in tfs.decide(slower)

    # raster strictly beating morton on every reported config -> override
    raster_wins = win_log.replace(
        '"sponza_1.3Mtris_1920x1080", "value": 0.2',
        '"sponza_1.3Mtris_1920x1080", "value": 0.5',
    ).replace('"glass_dragon_871k_512x512", "value": 2.0',
              '"glass_dragon_871k_512x512", "value": 3.5')
    assert tfs.decide(raster_wins).get("wave_order") == "raster"
    # a split decision (sponza wins, dragon loses) -> keep the default
    split = win_log.replace('"sponza_1.3Mtris_1920x1080", "value": 0.2',
                            '"sponza_1.3Mtris_1920x1080", "value": 0.5')
    assert "wave_order" not in tfs.decide(split)
    assert "wave_order" not in tfs.decide(win_log)

    # mid-size morton A/B: wins on both teapots + 47k dragon -> flip
    mid = win_log + "\n" + "\n".join([
        "=== START [CLIVE2_WAVE_ORDER=morton ] python bench.py (date)",
        '{"metric": "teapots_ggx_512x512", "value": 30.0, "unit": "Mrays/s"}',
        '{"metric": "glass_dragon_47k_512x512", "value": 9.0, "unit": "Mrays/s"}',
    ])
    assert "wave_order_mid" not in tfs.decide(mid)  # default lacks the rows
    base_mid = "\n".join([
        '{"metric": "teapots_ggx_512x512", "value": 22.6, "unit": "Mrays/s"}',
        '{"metric": "glass_dragon_47k_512x512", "value": 6.8, "unit": "Mrays/s"}',
    ])
    mid = mid.replace('{"metric": "cornell_256x256", "value": 120.0, '
                      '"unit": "Mrays/s"}',
                      '{"metric": "cornell_256x256", "value": 120.0, '
                      '"unit": "Mrays/s"}\n' + base_mid)
    assert tfs.decide(mid).get("wave_order_mid") == "morton"
    # teapots regresses -> no flip
    tied = mid.replace('"teapots_ggx_512x512", "value": 30.0',
                       '"teapots_ggx_512x512", "value": 20.0')
    assert "wave_order_mid" not in tfs.decide(tied)

    # --- wide_bits: flips on a clean sweep and RE-decides pop2/gate from
    # the rows measured WITH bits (the base-rule decisions were measured
    # without bits; the gate's cost model changes completely under bits)
    bits_rows = "\n".join([
        "wide47k-bits coherent: id match 100.00%  hitrate 0.9/0.9",
        "wide47k-bits incoherent: id match 100.00%  hitrate 0.6/0.6",
        "wide47k-bits coherent:     7.0 ms ->  28.00 Mrays/s",
        "wide47k-bits incoherent:  14.0 ms ->  14.00 Mrays/s",
        "wide47k-bits-gate coherent: id match 100.00%  hitrate 0.9/0.9",
        "wide47k-bits-gate incoherent: id match 100.00%  hitrate 0.6/0.6",
        "wide47k-bits-gate coherent:     9.0 ms ->  22.00 Mrays/s",
        "wide47k-bits-gate incoherent:  18.0 ms ->  11.00 Mrays/s",
    ])
    d = tfs.decide(win_log + "\n" + bits_rows)
    assert d.get("wide_bits") == "1"
    # base rule set wide_gate (gate beat base without bits), but under
    # bits the gate LOSES -> the re-decision must write an EXPLICIT "0"
    # (write_tuned merges; an earlier intermediate tune run may have
    # already persisted the pre-bits flip)
    assert d.get("wide_gate") == "0"
    # no bits-pop2 rows at all -> unmeasured combo must not deploy
    assert d.get("wide_pop2") == "0"
    # bits-gate beating bits -> gate survives the re-decision
    faster_gate = (win_log + "\n" + bits_rows).replace(
        "wide47k-bits-gate coherent:     9.0 ms ->  22.00 Mrays/s",
        "wide47k-bits-gate coherent:     6.0 ms ->  33.00 Mrays/s",
    ).replace(
        "wide47k-bits-gate incoherent:  18.0 ms ->  11.00 Mrays/s",
        "wide47k-bits-gate incoherent:  12.0 ms ->  16.00 Mrays/s",
    )
    d = tfs.decide(faster_gate)
    assert d.get("wide_bits") == "1" and d.get("wide_gate") == "1"
    # bits loses a regime -> no flip, and the base-rule gate decision
    # stands untouched
    bits_slow = (win_log + "\n" + bits_rows).replace(
        "wide47k-bits incoherent:  14.0 ms ->  14.00 Mrays/s",
        "wide47k-bits incoherent:  40.0 ms ->   5.00 Mrays/s",
    )
    d = tfs.decide(bits_slow)
    assert "wide_bits" not in d and d.get("wide_gate") == "1"


def test_stream2_config_selection():
    """The knob-sweep tuner: each val section self-describes its config;
    the winner must strictly beat the default config in both regimes."""
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    tfs = importlib.import_module("tune_from_session")

    def sec(env, rows, nbuf, occ, rowspec):
        lines = [f"=== START [{env}] python scripts/val_tpu_round3.py "
                 "stream2 (date)",
                 f"stream2 knobs: rows={rows} nbuf={nbuf} occ={occ}"]
        for tag, coh, inc in rowspec:
            lines += [
                f"{tag} coherent: id match 100.00%  hitrate 0.9/0.9",
                f"{tag} incoherent: id match 100.00%  hitrate 0.6/0.6",
                f"{tag} coherent:   100.0 ms ->  {coh:.2f} Mrays/s",
                f"{tag} incoherent: 200.0 ms ->  {inc:.2f} Mrays/s",
            ]
        return "\n".join(lines)

    log = "\n".join([
        sec("", 32, 4, 1, [("stream2", 10.0, 5.0)]),
        sec("CLIVE2_STREAM_ROWS=48 ", 48, 4, 1, [("stream2", 12.0, 6.0)]),
        sec("CLIVE2_STREAM_ROWS=48 CLIVE2_STREAM_NBUF=8 ", 48, 8, 1,
            [("stream2", 12.0, 6.0), ("stream2-agg", 13.0, 7.0),
             ("stream2-agg4", 15.0, 8.0)]),
    ])
    d = tfs.decide(log)
    assert (d["stream2_rows"], d["stream2_nbuf"], d["stream2_occ"],
            d["stream_agg"]) == ("48", "8", "1", "4")

    # agg4 correctness gate failed -> the dual-slot candidate wins
    broken4 = log.replace("stream2-agg4 incoherent: id match 100.00%",
                          "stream2-agg4 incoherent: id match 98.00%")
    d = tfs.decide(broken4)
    assert (d["stream2_nbuf"], d["stream_agg"]) == ("8", "1")

    # nothing strictly beats the default in both regimes -> no flips
    flat = log.replace("12.00 Mrays/s", "10.00 Mrays/s") \
              .replace("13.00 Mrays/s", "9.00 Mrays/s") \
              .replace("15.00 Mrays/s", "9.50 Mrays/s")
    d = tfs.decide(flat)
    assert not any(k.startswith("stream2_") for k in d)
    assert "stream_agg" not in d

    # no default-config section (e.g. tuned.json already shifted the
    # defaults) -> conservative: no flips
    nodefault = "\n".join(log.split("\n")[6:])
    d = tfs.decide(nodefault)
    assert not any(k.startswith("stream2_") for k in d)


def test_tuner_refuses_flips_on_degraded_link():
    """VERDICT r3 #6: a session whose link-probe verdict is degraded must
    deploy NO tuned flips — its timing A/Bs carry no signal (round 3
    withheld flips by hand for exactly this; now it's mechanical)."""
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    tfs = importlib.import_module("tune_from_session")
    win_log = "\n".join([
        '{"phase": "verdict", "link": "degraded-transfer"}',
        "=== START [] python scripts/val_tpu_round3.py wide (date)",
        "wide47k-gate coherent: id match 100.00%  hitrate 0.3/0.3",
        "wide47k-gate incoherent: id match 100.00%  hitrate 0.2/0.2",
        "wide47k coherent:  1000.0 ms ->   1.00 Mrays/s",
        "wide47k incoherent:  1000.0 ms ->   1.00 Mrays/s",
        "wide47k-gate coherent:   500.0 ms ->   2.00 Mrays/s",
        "wide47k-gate incoherent:   500.0 ms ->   2.00 Mrays/s",
    ])
    assert tfs.decide(win_log) == {}
    healthy = win_log.replace("degraded-transfer", "healthy")
    assert tfs.decide(healthy).get("wide_gate") == "1"


def test_round5_deployed_defaults():
    """The round-5 hardware program deployed these defaults from
    measured A/Bs (docs/round5_summary.md); an accidental knob
    regression (env leak, tuned-file drift, refactor) should fail
    loudly here, not silently re-run a measured loser."""
    from clive2_tpu.ops import traverse_pallas2 as tp2
    from clive2_tpu.ops import traverse_stream2 as ts2

    assert tp2.PALLAS_LEAF == "rows"       # dragon 4.11 vs 3.75
    assert tp2.RAY_ROWS == 16              # r16 beat r8/r24/r32/r64
    assert tp2.QUAD == 8                   # 4.37 vs 4.10; 16 flat
    assert ts2.STREAM_SKIP == "word"       # +7% inc at 200k vs span
    assert ts2.STREAM_ACC == "full"        # row-acc lost 3.5-6.6%
    assert ts2.GROUPS == 4                 # code group rides qleaf SMEM
    from clive2_tpu.integrator.connect import CONNECT_K

    assert CONNECT_K == 0                  # compaction measured negative
