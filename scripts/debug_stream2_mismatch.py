"""Characterize the stream2 hardware mismatch (round 4).

2026-08-20: stream2 first ran on hardware at 64.54% coh / 79.58% inc id
match vs the gather-walk oracle — EXACTLY equal across ROWS=16/32/48,
NBUF=4/8, OCC on/off, agg 1/2/4, while interpret mode is 100%.  This
script prints the mismatch structure on the same 200k scene:

  * counts of {missed real hit, ghost hit, wrong winner} rays;
  * t-error distribution on wrong winners;
  * whether wrongness follows the RAY (persists under a packet-boundary
    shift) or the SLOT (moves with position);
  * per-(ray % BLOCK_RAYS) lane/row histogram of wrong rays.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from clive2_tpu.bvh.build import build_bvh, leaf_tables
from clive2_tpu.ops import traverse_stream2 as ts2
from clive2_tpu.ops.intersect import intersect_bvh_packed, pack_gather_walk
from val_tpu_round3 import cluster_scene, rays

N = 32_768


def main():
    print("devices:", jax.devices(), flush=True)
    print(f"knobs: ROWS={ts2.RAY_ROWS} NBUF={ts2.NBUF} OCC={ts2.STREAM_OCC}",
          flush=True)
    soup = cluster_scene(200_000)
    bvh = build_bvh(soup)
    packed = {k: jnp.asarray(v) for k, v in ts2.pack_stream2(bvh, soup).items()}
    ga = {k: jnp.asarray(v) for k, v in
          pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}

    fn = jax.jit(lambda o, d, pk: ts2.intersect_stream2(
        o, d, pk, sort=False))

    for cname, coh in (("coherent", True), ("incoherent", False)):
        o, d = rays(N, coh)
        ov, dv = jnp.asarray(o), jnp.asarray(d)
        gi, gt, _, _ = (np.asarray(x) for x in fn(ov, dv, packed))
        wi, wt, _, _ = (np.asarray(x) for x in intersect_bvh_packed(
            ov, dv, ga))
        bad = gi != wi
        print(f"\n{cname}: match {(~bad).mean()*100:.2f}%  "
              f"hitrate got {(gi>=0).mean():.3f} want {(wi>=0).mean():.3f}",
              flush=True)
        missed = bad & (gi < 0) & (wi >= 0)
        ghost = bad & (gi >= 0) & (wi < 0)
        wrong = bad & (gi >= 0) & (wi >= 0)
        print(f"  missed={missed.sum()} ghost={ghost.sum()} "
              f"wrong_winner={wrong.sum()}", flush=True)
        if wrong.any():
            terr = np.abs(gt[wrong] - wt[wrong]) / np.maximum(wt[wrong], 1e-6)
            print(f"  wrong-winner rel t-err: median {np.median(terr):.2e} "
                  f"p90 {np.quantile(terr, 0.9):.2e} max {terr.max():.2e}",
                  flush=True)
        # position structure: which packet row/lane do bad rays sit in?
        idx = np.nonzero(bad)[0]
        lane = idx % ts2.LANES
        row = (idx // ts2.LANES) % ts2.RAY_ROWS
        print(f"  bad lanes: min {lane.min() if len(lane) else -1} "
              f"max {lane.max() if len(lane) else -1}  "
              f"rows histogram {np.bincount(row, minlength=ts2.RAY_ROWS)[:16]}",
              flush=True)

        # ray-vs-slot: shift every ray by half a packet; a ray-intrinsic
        # bug keeps the same RAYS wrong, a position bug the same SLOTS
        sh = ts2.BLOCK_RAYS // 2
        o2 = np.roll(o, sh, axis=0)
        d2 = np.roll(d, sh, axis=0)
        gi2, _, _, _ = (np.asarray(x) for x in fn(
            jnp.asarray(o2), jnp.asarray(d2), packed))
        bad2 = np.roll(gi2, -sh) != wi
        both = bad & bad2
        print(f"  shifted: bad={bad2.sum()} overlap_with_unshifted="
              f"{both.sum()} (ray-intrinsic if ~= bad count "
              f"{bad.sum()})", flush=True)


if __name__ == "__main__":
    main()
