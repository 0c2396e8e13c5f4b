"""Consolidated TPU validation + microbench for the round-3 kernel work.

Runs, in one process (one chip claim):
  1. stream2 bf16x6 correctness on the adversarial 200k-sliver scene
     (coherent + incoherent) vs the gather-walk oracle.
  2. stream2 throughput (coherent / incoherent, 1M rays).
  3. wide-kernel correctness + throughput on a 47k-tri dragon-scale
     scene (the register-fold leaf phase).

The "stream2agg" mode runs ONLY the dual-slot drain aggregation A/B
(intersect_stream2 agg=True — see traverse_stream2.drain2) so the
session can pay its Mosaic compiles in a separate time-boxed step;
tune_from_session.py flips the ``stream_agg`` tuned default when the
agg rows match 100% and beat the plain stream2 rows in both regimes.

The "widebits" mode runs ONLY the single-readout bit-packed box phase
A/B (intersect_wide bits=True — CLIVE2_WIDE_BITS) in its own step, so
a Mosaic compile failure there cannot starve the main wide gates;
tune_from_session.py compares its rows against the wide mode's wide47k
base rows (one shared log).

Usage: python scripts/val_tpu_round3.py [stream2|stream2agg|wide|widebits|all]

CLIVE2_VAL_SMOKE=1 shrinks every scene/ray count ~50x and runs the
Pallas kernels in interpret mode, so the WHOLE control flow of this
script — the thing the unattended queue executes with no human
watching — can be dry-run on CPU before the chip returns.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from clive2_tpu.bvh.build import build_bvh, leaf_tables
from clive2_tpu.geometry import TriangleSoup
from clive2_tpu.ops.intersect import intersect_bvh_packed, pack_gather_walk

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"
SMOKE = os.environ.get("CLIVE2_VAL_SMOKE", "") == "1"


def scaled(n):
    return max(1024, n // 50) if SMOKE else n


def cluster_scene(n_tris, seed=0):
    rng = np.random.default_rng(seed)
    n_clusters = max(1, n_tris // 200)
    cc = rng.uniform(-4, 4, (n_clusters, 1, 1, 3))
    tris = (cc + rng.uniform(-0.8, 0.8, (n_clusters, 200, 1, 3))
            + rng.uniform(-0.05, 0.05, (n_clusters, 200, 3, 3)))
    tris = tris.reshape(-1, 3, 3)[:n_tris].astype(np.float32)
    return TriangleSoup.from_vertices(tris)


def rays(n, coherent, seed=1):
    rng = np.random.default_rng(seed)
    if coherent:
        o = np.tile(np.array([[0.0, 0.0, 12.0]], np.float32), (n, 1))
        px = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
        tgt = np.stack([px[:, 0], px[:, 1], np.zeros(n, np.float32)], 1)
        d = tgt - o
    else:
        o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def sync(x):
    return float(np.asarray(x)[0])


def check(name, fn, packed, ga, nv=32768):
    nv = 2048 if SMOKE else nv
    for cname, coh in (("coherent", True), ("incoherent", False)):
        o, d = rays(nv, coh)
        ov, dv = jnp.asarray(o), jnp.asarray(d)
        t0 = time.time()
        gi, gt, gu, gv = (np.asarray(x) for x in fn(ov, dv, packed))
        dt = time.time() - t0
        wi, wt, wu, wv = (np.asarray(x) for x in
                          intersect_bvh_packed(ov, dv, ga))
        m = (gi == wi).mean()
        same = (gi == wi) & (wi >= 0)
        terr = np.abs(gt[same] - wt[same]).max() if same.any() else 0.0
        print(f"{name} {cname}: id match {m*100:.2f}%  hitrate "
              f"{(gi>=0).mean():.3f}/{(wi>=0).mean():.3f}  max|dt| "
              f"{terr:.2e}  (first call {dt:.0f}s)", flush=True)


def bench(name, fn, packed, n=1_000_000):
    n = 8192 if SMOKE else n
    for cname, coh in (("coherent", True), ("incoherent", False)):
        o, d = rays(n, coh)
        ov, dv = jnp.asarray(o), jnp.asarray(d)
        r = fn(ov, dv, packed)
        sync(r[1][:1])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = fn(ov, dv, packed)
            sync(r[1][:1])
            best = min(best, time.time() - t0)
        print(f"{name} {cname}: {best*1e3:7.1f} ms -> "
              f"{n/best/1e6:6.2f} Mrays/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    if WHICH in ("stream2", "stream2agg", "all"):
        from clive2_tpu.ops import traverse_stream2 as ts2

        soup = cluster_scene(scaled(200_000))
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v)
                  for k, v in ts2.pack_stream2(bvh, soup).items()}
        print(f"stream2 fat blocks {packed['leafblocks'].shape} "
              f"{packed['leafblocks'].size*2/1e6:.0f} MB bf16", flush=True)
        # effective knobs (env OR tuned defaults) — tune_from_session
        # attributes this section's rows to this exact configuration,
        # immune to a pre-existing tuned.json shifting the defaults
        print(f"stream2 knobs: rows={ts2.RAY_ROWS} nbuf={ts2.NBUF} "
              f"occ={ts2.STREAM_OCC}", flush=True)
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        if WHICH == "stream2agg":
            fna = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
                o, d, pk, sort=True, agg=True, interpret=SMOKE))
            check("stream2-agg", fna, packed, ga)
            bench("stream2-agg", fna, packed)
            if ts2.NBUF >= 8:
                # quad-slot drain: only meaningful with a ring deep
                # enough to hold 4 ready slots (the session pins
                # CLIVE2_STREAM_NBUF=8 for this step)
                fn4 = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
                    o, d, pk, sort=True, agg=4, interpret=SMOKE))
                check("stream2-agg4", fn4, packed, ga)
                bench("stream2-agg4", fn4, packed)
            # same-env single-slot baseline so the tuner can compare
            # agg depths within ONE knob configuration
            fnb = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
                o, d, pk, sort=True, agg=False, interpret=SMOKE))
            check("stream2", fnb, packed, ga)
            bench("stream2", fnb, packed)
        else:
            fn = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
                o, d, pk, sort=True, agg=False, interpret=SMOKE))
            check("stream2", fn, packed, ga)
            bench("stream2", fn, packed)

    if WHICH in ("wide", "all"):
        from clive2_tpu.ops import traverse_wide as tw

        # 47k = dragon scale; 90k = the new slot-packed window (scenes
        # that exceed the binary kernel's SMEM but now fit wide's VMEM)
        for n_tris, tag in ((47_000, "wide47k"), (90_000, "wide90k")):
            soup = cluster_scene(scaled(n_tris), seed=3)
            bvh = build_bvh(soup)
            packed_np = tw.pack_bvh8(bvh, soup)
            print(f"{tag}: vmem {tw.vmem_bytes(packed_np)/2**20:.2f} MB "
                  f"smem {tw.smem_bytes(packed_np)/1024:.0f} KB", flush=True)
            packed = {k: jnp.asarray(v) for k, v in packed_np.items()}
            ga = {k: jnp.asarray(v) for k, v in
                  pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
            fn = jax.jit(lambda o, d, pk: tw.intersect_wide(
                o, d, pk, interpret=SMOKE))
            check(tag, fn, packed, ga)
            bench(tag, fn, packed)
            if tag == "wide47k":
                # per-group leaf-gating A/B (CLIVE2_WIDE_GATE lever):
                # pays its own Mosaic compile; coherent rays are the
                # case the gate targets (1-3 of 8 groups per leaf child)
                fng = jax.jit(lambda o, d, pk: tw.intersect_wide(
                    o, d, pk, group_gate=True, interpret=SMOKE))
                check(tag + "-gate", fng, packed, ga)
                bench(tag + "-gate", fng, packed)
                # dual-pop A/B (CLIVE2_WIDE_POP2): overlaps two box-phase
                # scalar-window chains per while iteration (the binary
                # kernel's QUAD-pop precedent); register pressure may
                # flip the sign, hence the A/B
                fnp = jax.jit(lambda o, d, pk: tw.intersect_wide(
                    o, d, pk, pop2=True, interpret=SMOKE))
                check(tag + "-pop2", fnp, packed, ga)
                bench(tag + "-pop2", fnp, packed)
            # compact 12-slot leaf layout A/B (CLIVE2_WIDE_COMPACT):
            # ~1.5x smaller VMEM leaf table for one extra dynamic lane
            # roll per leaf-phase node; also decides the big-scene
            # ceiling (compact extends wide to ~150k tris)
            packed_c = {k: jnp.asarray(v) for k, v in
                        tw.pack_bvh8(bvh, soup, compact=True).items()}
            check(tag + "-compact", fn, packed_c, ga)
            bench(tag + "-compact", fn, packed_c)

    if WHICH in ("widebits", "all"):
        from clive2_tpu.ops import traverse_wide as tw

        # single-readout bit-packed box phase (CLIVE2_WIDE_BITS): the
        # pop's 8 per-child jnp.min readouts + chained best-ref sweep
        # (the measured serial cost; Mosaic serializes scalar/reduce
        # chains) collapse into ONE f32 readout.  Also re-decides pop2
        # and the group gate UNDER bits (the gate's 64 reduce->cond
        # windows become 3 packed readouts, which can flip its sign).
        soup = cluster_scene(scaled(47_000), seed=3)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v)
                  for k, v in tw.pack_bvh8(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        for tag, kw in (("wide47k-bits", dict(bits=True)),
                        ("wide47k-bits-pop2", dict(bits=True, pop2=True)),
                        ("wide47k-bits-gate",
                         dict(bits=True, group_gate=True))):
            fn = jax.jit(lambda o, d, pk, kw=kw: tw.intersect_wide(
                o, d, pk, interpret=SMOKE, **kw))
            check(tag, fn, packed, ga)
            bench(tag, fn, packed)

    if WHICH in ("wide", "all"):
        from clive2_tpu.ops import traverse_wide as tw

        # the compact-only window: scenes past the padded layout's VMEM
        # budget that now stay resident instead of streaming
        soup = cluster_scene(scaled(150_000), seed=3)
        bvh = build_bvh(soup)
        packed_np = tw.pack_bvh8(bvh, soup, compact=True)
        print(f"wide150k-compact: vmem {tw.vmem_bytes(packed_np)/2**20:.2f}"
              f" MB smem {tw.smem_bytes(packed_np)/1024:.0f} KB", flush=True)
        packed = {k: jnp.asarray(v) for k, v in packed_np.items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        fn = jax.jit(lambda o, d, pk: tw.intersect_wide(
            o, d, pk, interpret=SMOKE))
        check("wide150k-compact", fn, packed, ga)
        bench("wide150k-compact", fn, packed)


if __name__ == "__main__":
    main()
