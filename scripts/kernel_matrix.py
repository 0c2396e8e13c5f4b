"""Hardware kernel-performance matrix (round 4).

Round 3's link theory ("val microbenches are tunnel-bound") was refuted
on 2026-08-20: pipelined dispatch (5 back-to-back calls, one block)
measures the SAME 0.38-0.43 Mrays/s as the val-style loop on wide47k —
the wide kernel is genuinely that slow on-chip (diag_wide_tunnel.py).
This script measures every traversal kernel x variant x scene size with
pipelined timing, emitting one JSON line per row, so kernel defaults and
output/tuned.json are decided from data instead of theory.

Sections (run one per invocation — a device fault must not kill the
matrix; drive with scripts/run_matrix.sh):

  pallas2_6k    binary packet kernel, teapot-scale (6.3k cluster)
  pallas2_20k   binary packet kernel near its SMEM ceiling
  wide47        wide base / bits / pop2 / gate / compact (47k)
  widebits47    bits / bits-pop2 / bits-gate (47k)
  gather47      XLA gather-walk fallback at 47k (sanity baseline)
  stream200     stream1 vs stream2 vs stream2-agg2/agg4 (200k)
  stream2knobs  stream2 ROWS/NBUF/OCC sweep (200k)
  sponza        stream1 vs stream2 on the real 1.3M-tri sponza mesh

Correctness gate: each variant's first (coherent) run is id-matched
against the gather-walk oracle before timing; rows report match%.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from clive2_tpu.bvh.build import build_bvh, leaf_tables
from clive2_tpu.ops.intersect import intersect_bvh_packed, pack_gather_walk
from val_tpu_round3 import cluster_scene, rays  # noqa: E402

SECTION = sys.argv[1] if len(sys.argv) > 1 else "wide47"
N_RAYS = int(os.environ.get("MATRIX_RAYS", 1_000_000))
N_CHECK = 32_768


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(tag, fn, packed, ga=None, n=N_RAYS, pipeline=5):
    """Correctness vs oracle (32k rays), then pipelined throughput."""
    row = {"row": tag}
    for cname, coh in (("coh", True), ("inc", False)):
        o, d = rays(N_CHECK, coh)
        ov, dv = jnp.asarray(o), jnp.asarray(d)
        t0 = time.perf_counter()
        try:
            gi = np.asarray(fn(ov, dv, packed)[0])
        except Exception as e:
            row[f"{cname}_error"] = str(e)[:200]
            emit(**row)
            return row
        row[f"compile_{cname}_s"] = round(time.perf_counter() - t0, 1)
        if ga is not None:
            wi = np.asarray(intersect_bvh_packed(ov, dv, ga)[0])
            row[f"match_{cname}"] = round(float((gi == wi).mean()) * 100, 2)

        o, d = rays(n, coh)
        ov, dv = jnp.asarray(o), jnp.asarray(d)
        jax.block_until_ready((ov, dv))
        r = fn(ov, dv, packed)
        jax.block_until_ready(r)           # pay the n-sized compile
        t0 = time.perf_counter()
        outs = [fn(ov, dv, packed) for _ in range(pipeline)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / pipeline
        row[f"mrays_{cname}"] = round(n / dt / 1e6, 2)
        row[f"ms_{cname}"] = round(dt * 1e3, 1)
    emit(**row)
    return row


def ga_pack(bvh, soup):
    return {k: jnp.asarray(v) for k, v in
            pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}


def main():
    emit(row="section", name=SECTION, t=time.strftime("%H:%M:%S"))
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    if SECTION in ("pallas2_6k", "pallas2_20k"):
        from clive2_tpu.ops import traverse_pallas2 as tp2

        n_tris = 6_300 if SECTION == "pallas2_6k" else 20_000
        soup = cluster_scene(n_tris, seed=3)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v)
                  for k, v in tp2.pack_bvh2(bvh, soup).items()}
        ga = ga_pack(bvh, soup)
        for sort in (False, True):
            fn = jax.jit(lambda o, d, pk, s=sort: tp2.intersect_pallas2(
                o, d, pk, sort=s))
            measure(f"pallas2_{n_tris//1000}k{'_sort' if sort else ''}",
                    fn, packed, ga)

    elif SECTION == "wide47":
        from clive2_tpu.ops import traverse_wide as tw

        soup = cluster_scene(47_000, seed=3)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v)
                  for k, v in tw.pack_bvh8(bvh, soup).items()}
        packed_c = {k: jnp.asarray(v)
                    for k, v in tw.pack_bvh8(bvh, soup, compact=True).items()}
        ga = ga_pack(bvh, soup)
        for tag, pk, kw in (
                ("wide47", packed, {}),
                ("wide47_pop2", packed, dict(pop2=True)),
                ("wide47_gate", packed, dict(group_gate=True)),
                ("wide47_compact", packed_c, {})):
            fn = jax.jit(lambda o, d, pk, kw=kw: tw.intersect_wide(
                o, d, pk, **kw))
            measure(tag, fn, pk, ga)

    elif SECTION == "widebits47":
        from clive2_tpu.ops import traverse_wide as tw

        soup = cluster_scene(47_000, seed=3)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v)
                  for k, v in tw.pack_bvh8(bvh, soup).items()}
        ga = ga_pack(bvh, soup)
        for tag, kw in (
                ("wide47_bits", dict(bits=True)),
                ("wide47_bits_pop2", dict(bits=True, pop2=True)),
                ("wide47_bits_gate", dict(bits=True, group_gate=True))):
            fn = jax.jit(lambda o, d, pk, kw=kw: tw.intersect_wide(
                o, d, pk, **kw))
            measure(tag, fn, packed, ga)

    elif SECTION == "gather47":
        soup = cluster_scene(47_000, seed=3)
        bvh = build_bvh(soup)
        ga = ga_pack(bvh, soup)
        fn = jax.jit(lambda o, d, pk: intersect_bvh_packed(o, d, pk))
        measure("gather47", fn, ga, None)

    elif SECTION == "stream200":
        from clive2_tpu.ops import traverse_stream as ts1
        from clive2_tpu.ops import traverse_stream2 as ts2

        soup = cluster_scene(200_000)
        bvh = build_bvh(soup)
        ga = ga_pack(bvh, soup)
        p2 = {k: jnp.asarray(v)
              for k, v in ts2.pack_stream2(bvh, soup).items()}
        if os.environ.get("MATRIX_STREAM1") == "1":  # fenced kernel:
            # measure only on explicit request (round-4 rows stand)
            p1 = {k: jnp.asarray(v)
                  for k, v in ts1.pack_stream(bvh, soup).items()}
            fn1 = jax.jit(lambda o, d, pk: ts1.intersect_stream(
                o, d, pk, sort=True))
            measure("stream1_200k", fn1, p1, ga)
        # env-driven skip/acc A/B rows; agg rows only on request (round-4
        # and -5 both measured agg neutral)
        variant = f"{ts2.STREAM_SKIP}_{ts2.STREAM_ACC}"
        rows = [(False, f"stream2_200k_{variant}")]
        if os.environ.get("MATRIX_AGG") == "1":
            rows += [(True, f"stream2_agg2_{variant}"),
                     (4, f"stream2_agg4_{variant}")]
        for agg, tag in rows:
            fn2 = jax.jit(lambda o, d, pk, agg=agg: ts2.intersect_stream2(
                o, d, pk, sort=True, agg=agg))
            measure(tag, fn2, p2, ga)

    elif SECTION == "stream2knobs":
        # ROWS/NBUF via env (module constants read at import) — this
        # section is re-invoked by run_matrix.sh with different env
        from clive2_tpu.ops import traverse_stream2 as ts2

        soup = cluster_scene(200_000)
        bvh = build_bvh(soup)
        ga = ga_pack(bvh, soup)
        p2 = {k: jnp.asarray(v)
              for k, v in ts2.pack_stream2(bvh, soup).items()}
        tag = (f"stream2_r{ts2.RAY_ROWS}_n{ts2.NBUF}"
               f"_o{int(ts2.STREAM_OCC)}")
        fn2 = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
            o, d, pk, sort=True))
        measure(tag, fn2, p2, ga)

    elif SECTION == "r5_47k":
        # round-5 mid-size decision data: at 47k tris (dragon scale) —
        # pallas2 (the production path), stream2 (the candidate), and
        # under CLIVE2_PALLAS_DIAG=noleaf the pallas2 walk WITHOUT the
        # leaf phase (node/leaf cost split; results corrupt, so the
        # oracle gate is skipped).  Env-driven variants (skip mode,
        # diag) re-invoke this section in fresh processes.
        from clive2_tpu.ops import traverse_pallas2 as tp2
        from clive2_tpu.ops import traverse_stream2 as ts2

        diag = os.environ.get("CLIVE2_PALLAS_DIAG", "")
        n_tris = int(os.environ.get("MATRIX_TRIS", 47_000))
        soup = cluster_scene(n_tris, seed=3)
        bvh = build_bvh(soup)
        ga = None if diag else ga_pack(bvh, soup)
        if os.environ.get("MATRIX_NOPALLAS") != "1":
            packed = {k: jnp.asarray(v)
                      for k, v in tp2.pack_bvh2(bvh, soup).items()}
            fn = jax.jit(lambda o, d, pk: tp2.intersect_pallas2(
                o, d, pk, sort=True))
            measure(f"pallas2_{n_tris // 1000}k_{tp2.PALLAS_LEAF}"
                    f"_r{tp2.RAY_ROWS}{'_' + diag if diag else ''}",
                    fn, packed, ga)
        if not diag and os.environ.get("MATRIX_NOSTREAM") != "1":
            p2 = {k: jnp.asarray(v)
                  for k, v in ts2.pack_stream2(bvh, soup).items()}
            fn2 = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
                o, d, pk, sort=True))
            measure(f"stream2_{n_tris // 1000}k_{ts2.STREAM_SKIP}"
                    f"_{ts2.STREAM_ACC}", fn2, p2, ga)

    elif SECTION == "sponza":
        from clive2_tpu.load import load_ply
        from clive2_tpu.ops import traverse_stream as ts1
        from clive2_tpu.ops import traverse_stream2 as ts2

        res = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "resources")
        soup = load_ply(os.path.join(res, "sponza_scale.ply"))
        emit(row="sponza_mesh", n_tris=len(soup))
        bvh = build_bvh(soup)
        ga = ga_pack(bvh, soup)
        p1 = {k: jnp.asarray(v) for k, v in ts1.pack_stream(bvh, soup).items()}
        fn1 = jax.jit(lambda o, d, pk: ts1.intersect_stream(
            o, d, pk, sort=True))
        measure("stream1_sponza", fn1, p1, ga, n=min(N_RAYS, 500_000))
        p2 = {k: jnp.asarray(v)
              for k, v in ts2.pack_stream2(bvh, soup).items()}
        fn2 = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
            o, d, pk, sort=True))
        measure("stream2_sponza", fn2, p2, ga, n=min(N_RAYS, 500_000))

    else:
        raise SystemExit(f"unknown section {SECTION}")

    emit(row="section_done", name=SECTION, t=time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
