"""Host-side chunk-visit accounting for the stream2 drain (round 4).

The 2026-08-20 nodrain split attributed 73% of stream2's incoherent
time to the drain (1220 of 1676 ms on 1M rays / 200k-tri adversarial).
This script reproduces that workload ON HOST with the exact top-tree
walk (scripts/dma_model.py machinery) and counts, per (packet,
fat-leaf) drain invocation:

  * live chunks (>=1 interested ray -> one MXU matmul + merge), and
  * span chunks (the fori_loop range lo..hi the kernel actually runs —
    dead in-span chunks still pay a mask read + branch),

then divides the measured drain time by each, giving ns/chunk figures
— the design numbers for any round-5 drain rework (the ROADMAP
~160 ns/chunk-visit estimate was never recomputed after the K-repack
and span trimming).

Pure host + arithmetic: no chip needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from clive2_tpu.bvh.build import build_bvh
from clive2_tpu.ops.traverse_pallas2 import _morton_key
from dma_model import top_tree, walk_visits
from val_tpu_round3 import cluster_scene, rays

LANES = 128
ROWS = 32               # production stream2 packet height
MEASURED = {            # 2026-08-20 readback-timed, 1M rays
    # regime: (full_ms, nodrain_ms)
    "coh": (191.2, 114.0),
    "inc": (1676.2, 455.9),
}


def main():
    import jax.numpy as jnp

    soup = cluster_scene(200_000)
    bvh = build_bvh(soup)
    childs, boxes, n_fat, _area = top_tree(bvh, 1)
    lo, hi = bvh.node_mins[0], bvh.node_maxes[0]
    print(f"200k cluster: n_fat={n_fat}", flush=True)

    for regime, coh in (("coh", True), ("inc", False)):
        o, d = rays(1_000_000, coh)
        n = len(o)
        t_max = np.full(n, np.inf, np.float32)
        key = np.asarray(_morton_key(jnp.asarray(o), jnp.asarray(d),
                                     jnp.asarray(lo), jnp.asarray(hi)))
        order = np.argsort(key, kind="stable")
        vis_r, vis_f = walk_visits(o, d, t_max, childs, boxes)
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        pkt = rank[vis_r] // (ROWS * LANES)
        chunk = (rank[vis_r] // LANES) % ROWS

        # drain invocations: unique (packet, fat)
        pf = pkt * n_fat + vis_f
        uniq_pf, inv = np.unique(pf, return_inverse=True)
        drains = len(uniq_pf)

        # live chunks per drain: unique (packet, fat, chunk)
        pfc = pf * ROWS + chunk
        live_chunks = len(np.unique(pfc))

        # span chunks per drain: max-min+1 of chunk within each (p,f)
        cmin = np.full(drains, ROWS, np.int64)
        cmax = np.full(drains, -1, np.int64)
        np.minimum.at(cmin, inv, chunk)
        np.maximum.at(cmax, inv, chunk)
        span_chunks = int((cmax - cmin + 1).sum())

        full_ms, nodrain_ms = MEASURED[regime]
        drain_ms = full_ms - nodrain_ms
        print(f"{regime}: drains={drains}  live_chunks={live_chunks} "
              f"({live_chunks/drains:.2f}/drain)  span_chunks={span_chunks} "
              f"({span_chunks/drains:.2f}/drain)")
        print(f"     measured drain {drain_ms:.0f} ms -> "
              f"{drain_ms*1e6/max(live_chunks,1):7.0f} ns/live-chunk, "
              f"{drain_ms*1e6/max(span_chunks,1):7.0f} ns/span-chunk, "
              f"{drain_ms*1e6/max(drains,1):7.0f} ns/drain", flush=True)


if __name__ == "__main__":
    main()
