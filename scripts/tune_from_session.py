"""Turn a hardware-validation session log into deployment-tuned kernel
defaults (clive2_tpu/utils/tuned.py), so wins measured by the unattended
queue (scripts/tpu_queue.sh -> tpu_session.sh) take effect for every
later render without a code edit.

Decisions (conservative — a flip requires BOTH correctness and a win):
  stream_impl=2   if the stream2 correctness gate passed (id match 100%
                  coherent AND incoherent in val_tpu_round3 output) and
                  the CLIVE2_STREAM_IMPL=2 bench section beats the
                  default-config section on the sponza row without
                  losing on big_dragon.
  wide_gate=1     if the wide47k-gate check matched 100% in both regimes
                  and its bench beat the ungated wide47k in both.
  stream2_rows/stream2_nbuf/stream2_occ/stream_agg   from the knob-sweep
                  val section (each self-describes its effective config
                  via its "stream2 knobs:" line; agg depth from which
                  row tag won) that strictly beats the default config
                  in BOTH regimes with the best coherent*incoherent
                  product.  Without this rule a winning sweep config
                  would be measured and never deployed.
  wave_order=raster  if the CLIVE2_WAVE_ORDER=raster bench section beats
                  the default (morton) section on every streaming config
                  both report (correctness is estimator-invariant — lane
                  order only re-pairs RNG streams — so no gate needed).
  wave_order_mid=morton  if the CLIVE2_WAVE_ORDER=morton teapots/dragon
                  section beats the default (raster) section on every
                  mid-size config both report.

Usage: python scripts/tune_from_session.py /tmp/tpu_queue.log
"""

import json
import re
import sys

sys.path.insert(0, ".")


def parse_bench_sections(text):
    """(header, rows) per '=== START ... bench.py' section, in order.
    The header is the full START line — tpu_session.sh's step() embeds
    the CLIVE2_* env there so A/B sections are distinguishable."""
    sections = []
    cur = None
    for line in text.splitlines():
        if "=== START" in line and "bench.py" in line:
            cur = {}
            sections.append((line, cur))
        elif "=== START" in line:
            cur = None
        elif cur is not None and line.startswith("{"):
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if "metric" in row:
                cur[row["metric"]] = row.get("value")
    return sections


def metric_value(rows, *needles):
    """Value of the first metric containing any needle.  Success rows use
    descriptive metric names (e.g. glass_dragon_871k_512x512); timeout /
    error rows fall back to the config name (big_dragon) — match both."""
    for m, v in rows.items():
        if any(nd in m for nd in needles):
            return v
    return None


def check_pass(text, tag):
    """val_tpu_round3 'id match 100.00%' in both regimes for ``tag``."""
    pat = re.compile(rf"^{re.escape(tag)} (coherent|incoherent): "
                     rf"id match 100\.00?%", re.M)
    return len(set(pat.findall(text))) == 2


def bench_mrays(text, tag, regime):
    pat = re.compile(rf"^{re.escape(tag)} {regime}:\s+[\d.]+ ms ->\s+"
                     rf"([\d.]+) Mrays/s", re.M)
    vals = [float(v) for v in pat.findall(text)]
    return max(vals) if vals else None


def parse_val_sections(text):
    """(cmd, body) per '=== START [env] cmd (date)' step block."""
    sections = []
    cur_lines = None
    cur_cmd = None
    for line in text.splitlines():
        if "=== START" in line:
            if cur_cmd is not None:
                sections.append((cur_cmd, "\n".join(cur_lines)))
            cur_cmd = line
            cur_lines = []
        elif cur_cmd is not None:
            cur_lines.append(line)
    if cur_cmd is not None:
        sections.append((cur_cmd, "\n".join(cur_lines)))
    return sections


def _stream2_candidates(text):
    """One candidate per (val section, agg depth) whose correctness gate
    passed and whose bench rows exist: the section's effective knobs
    (from its self-describing "stream2 knobs:" line) + the agg depth +
    the two regime throughputs."""
    tag_agg = (("stream2", "0"), ("stream2-agg", "1"), ("stream2-agg4", "4"))
    out = []
    for cmd, body in parse_val_sections(text):
        if "val_tpu_round3.py" not in cmd:
            continue
        knobs = re.search(r"^stream2 knobs: rows=(\d+) nbuf=(\d+) "
                          r"occ=(\d+)", body, re.M)
        if not knobs:
            continue
        for tag, aggv in tag_agg:
            if not check_pass(body, tag):
                continue
            coh = bench_mrays(body, tag, "coherent")
            inc = bench_mrays(body, tag, "incoherent")
            if coh is None or inc is None:
                continue
            out.append(dict(rows=knobs.group(1), nbuf=knobs.group(2),
                            occ=knobs.group(3), agg=aggv,
                            coh=coh, inc=inc))
    return out


def decide(text):
    updates = {}

    # link-health gate (VERDICT r3 #6, formalized round 4): the session
    # log opens with scripts/link_probe.py's verdict line.  A degraded
    # link invalidates every TIMING comparison in the log (round 3
    # deployed no flips for exactly this reason, by hand) — correctness
    # rows remain valid but no tuned default may flip on their times.
    # Parse the actual JSON verdict lines and gate on the LAST one: a
    # session that re-probes healthy after one transient degraded
    # verdict still deploys (the former substring grep matched anywhere
    # in the log and was coupled to json.dumps formatting).
    last_link = None
    for line in text.splitlines():
        line = line.strip()
        if not (line.startswith("{") and '"verdict"' in line):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("phase") == "verdict" and "link" in rec:
            last_link = str(rec["link"])
    if last_link is not None and last_link.startswith("degraded"):
        return updates

    # --- wide-kernel per-group leaf gating --------------------------------
    if check_pass(text, "wide47k-gate"):
        wins = []
        for regime in ("coherent", "incoherent"):
            base = bench_mrays(text, "wide47k", regime)
            gate = bench_mrays(text, "wide47k-gate", regime)
            wins.append(base is not None and gate is not None
                        and gate > base)
        if all(wins):
            updates["wide_gate"] = "1"

    # --- wide-kernel dual pop ------------------------------------------------
    if check_pass(text, "wide47k-pop2"):
        wins = []
        for regime in ("coherent", "incoherent"):
            base = bench_mrays(text, "wide47k", regime)
            p2 = bench_mrays(text, "wide47k-pop2", regime)
            wins.append(base is not None and p2 is not None and p2 > base)
        if all(wins):
            updates["wide_pop2"] = "1"

    # --- wide-kernel compact 12-slot leaf layout -----------------------------
    wins = []
    for tag in ("wide47k", "wide90k"):
        if not check_pass(text, tag + "-compact"):
            wins = [False]
            break
        for regime in ("coherent", "incoherent"):
            base = bench_mrays(text, tag, regime)
            comp = bench_mrays(text, tag + "-compact", regime)
            wins.append(base is not None and comp is not None
                        and comp > base)
    if wins and all(wins):
        updates["wide_compact"] = "1"

    # --- wide-kernel bit-packed box phase -----------------------------------
    # wide_bits flips when the bits row beats the base wide47k row in
    # both regimes.  When it flips, pop2/gate are RE-decided from the
    # rows measured WITH bits (wide47k-bits-pop2 / -gate vs wide47k-bits)
    # — the base-rule decisions above were measured without bits, and
    # e.g. the gate's cost model changes completely under bits (64
    # reduce->cond windows become 3 packed readouts).
    if check_pass(text, "wide47k-bits"):
        wins = []
        for regime in ("coherent", "incoherent"):
            base = bench_mrays(text, "wide47k", regime)
            bt = bench_mrays(text, "wide47k-bits", regime)
            wins.append(base is not None and bt is not None and bt > base)
        if all(wins):
            updates["wide_bits"] = "1"
            for knob, tag in (("wide_pop2", "wide47k-bits-pop2"),
                              ("wide_gate", "wide47k-bits-gate")):
                sub = []
                for regime in ("coherent", "incoherent"):
                    bt = bench_mrays(text, "wide47k-bits", regime)
                    v = bench_mrays(text, tag, regime)
                    sub.append(bt is not None and v is not None and v > bt)
                if check_pass(text, tag) and all(sub):
                    updates[knob] = "1"
                else:
                    # explicit "0": write_tuned MERGES, so a flip earned
                    # by an earlier (intermediate) tune run must be
                    # actively overridden once bits changes the basis
                    updates[knob] = "0"

    # --- stream2 knob configuration (rows x nbuf x occ x agg depth) ---------
    # The session sweeps these knobs across val sections; each section
    # self-describes its effective config via the "stream2 knobs:" line.
    # The winner (strictly beating the default config in BOTH regimes;
    # best coherent*incoherent product among those) deploys as the
    # stream2_* tuned defaults — without this, a winning sweep config
    # would be measured and then never used.
    cands = _stream2_candidates(text)
    base = next((c for c in cands if (c["rows"], c["nbuf"], c["occ"],
                                      c["agg"]) == ("32", "4", "1", "0")),
                None)
    if base is not None:
        better = [c for c in cands
                  if c["coh"] > base["coh"] and c["inc"] > base["inc"]]
        if better:
            win = max(better, key=lambda c: c["coh"] * c["inc"])
            updates["stream2_rows"] = win["rows"]
            updates["stream2_nbuf"] = win["nbuf"]
            updates["stream2_occ"] = win["occ"]
            updates["stream_agg"] = win["agg"]

    sections = parse_bench_sections(text)
    default = next((rows for hdr, rows in reversed(sections)
                    if metric_value(rows, "cornell") is not None
                    and "CLIVE2_WAVE_ORDER=raster" not in hdr), None)

    # --- wavefront order (streaming scenes) --------------------------------
    # auto default is morton (model-guided, render.py _wave_order); the
    # raster-pinned section vs the default bench is the hardware A/B.
    raster = next((rows for hdr, rows in sections
                   if "CLIVE2_WAVE_ORDER=raster" in hdr
                   and metric_value(rows, "sponza") is not None), None)
    if raster and default:
        wins = losses = 0
        for needles in (("sponza",), ("871k", "big_dragon"),
                        ("202", "medium_dragon")):
            r = metric_value(raster, *needles)
            m = metric_value(default, *needles)
            if isinstance(r, (int, float)) and isinstance(m, (int, float)):
                wins += r > m
                losses += m > r
        if wins and not losses:
            updates["wave_order"] = "raster"

    # --- wavefront order (mid-size packet-kernel scenes) --------------------
    # default is raster; the morton-pinned teapots/dragon section vs the
    # default bench decides whether morton's model win holds on hardware.
    morton_mid = next((rows for hdr, rows in sections
                       if "CLIVE2_WAVE_ORDER=morton" in hdr
                       and metric_value(rows, "teapot") is not None), None)
    if morton_mid and default:
        wins = losses = 0
        for needles in (("teapot",), ("47", "dragon_512")):
            m = metric_value(morton_mid, *needles)
            r = metric_value(default, *needles)
            if isinstance(m, (int, float)) and isinstance(r, (int, float)):
                wins += m > r
                losses += r > m
        if wins and not losses:
            updates["wave_order_mid"] = "morton"

    # --- raised VMEM budget (resident compact wide for ~200k scenes) --------
    vmem_ab = next((rows for hdr, rows in sections
                    if "CLIVE2_PALLAS_VMEM=14680064" in hdr
                    and metric_value(rows, "202", "medium_dragon")
                    is not None), None)
    if vmem_ab and default:
        a = metric_value(vmem_ab, "202", "medium_dragon")
        b = metric_value(default, "202", "medium_dragon")
        if (isinstance(a, (int, float)) and isinstance(b, (int, float))
                and a > b):
            updates["pallas_vmem"] = "14680064"

    # --- streaming impl ----------------------------------------------------
    if check_pass(text, "stream2"):
        ab = next((rows for hdr, rows in sections
                   if "CLIVE2_STREAM_IMPL=2" in hdr
                   and metric_value(rows, "sponza") is not None), None)
        if ab and default:
            s2_sponza = metric_value(ab, "sponza")
            s1_sponza = metric_value(default, "sponza")
            s2_big = metric_value(ab, "871k", "big_dragon")
            s1_big = metric_value(default, "871k", "big_dragon")
            sponza_win = (isinstance(s2_sponza, (int, float))
                          and isinstance(s1_sponza, (int, float))
                          and s2_sponza > s1_sponza)
            big_ok = (not isinstance(s2_big, (int, float))
                      or not isinstance(s1_big, (int, float))
                      or s2_big >= 0.9 * s1_big)
            if sponza_win and big_ok:
                updates["stream_impl"] = "2"
    return updates


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_queue.log"
    with open(log) as f:
        text = f.read()
    updates = decide(text)
    if not updates:
        print("tune_from_session: no flips earned; tuned file unchanged")
        return
    from clive2_tpu.utils.tuned import write_tuned

    path = write_tuned(updates)
    print(f"tune_from_session: wrote {updates} -> {path}")


if __name__ == "__main__":
    main()
