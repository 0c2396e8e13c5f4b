"""Host-exact packet-traversal waste model for the binary packet kernel
(ROADMAP round-6 item 3).

The round-5 gated leaf phase skips dead ray ROWS per leaf visit; the
next candidate waste is dead LANES inside live rows (each live row still
pays a full [8, 128] MT).  This script replays pallas2's traversal
per packet on the host — same morton order, same near-first descent,
same best-t culling semantics — and reports, per leaf visit:

  * live rows (of RAY_ROWS) — what the row gating already exploits;
  * live lanes per live row — the ceiling for any lane-compaction or
    sub-row design (if live rows average ~100/128 lanes, lane
    compaction is dead on arrival; if ~5/128, it is the next 10x).

Run on CPU: JAX_PLATFORMS=cpu python scripts/packet_model.py [n_tris]
  [n_rays] [rows] [packet_cap]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from clive2_tpu.bvh.build import build_bvh, leaf_tables
from val_tpu_round3 import cluster_scene, rays

LANES = 128


def morton_key(o, d, lo, hi):
    import jax.numpy as jnp

    from clive2_tpu.ops.traverse_pallas2 import _morton_key

    return np.asarray(_morton_key(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(lo), jnp.asarray(hi)))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 47_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 48   # sampled packets
    coherent = len(sys.argv) > 5 and sys.argv[5] == "coherent"
    R = rows * LANES

    soup = cluster_scene(n_tris, seed=3)
    bvh = build_bvh(soup)
    tables = leaf_tables(bvh, soup)
    o, d = rays(n_rays, coherent=coherent)
    key = morton_key(o, d, bvh.node_mins[0], bvh.node_maxes[0])
    order = np.argsort(key)
    o, d = o[order].astype(np.float64), d[order].astype(np.float64)

    mins, maxes = bvh.node_mins, bvh.node_maxes
    right, leaf_id = bvh.right_child, bvh.leaf_id
    v0 = tables["v0"].astype(np.float64)          # [L, 8, 3]
    e1 = tables["e1"].astype(np.float64)
    e2 = tables["e2"].astype(np.float64)
    filled = tables["tri_index"] >= 0             # [L, 8]

    n_packets = len(o) // R
    sel = np.linspace(0, n_packets - 1, min(cap, n_packets)).astype(int)
    tot_visits = tot_live_rows = tot_live_lanes = tot_pops = 0
    lane_hist = np.zeros(LANES + 1, dtype=np.int64)

    for pi in sel:
        po = o[pi * R:(pi + 1) * R]
        pd = d[pi * R:(pi + 1) * R]
        inv = 1.0 / np.where(np.abs(pd) < 1e-30,
                             np.where(pd < 0, -1e-30, 1e-30), pd)
        best = np.full(R, np.inf)

        def slab(node):
            t0 = (mins[node] - po) * inv
            t1 = (maxes[node] - po) * inv
            tn = np.maximum(np.minimum(t0, t1).max(1), 0.0)
            tf = np.minimum(np.maximum(t0, t1).min(1), best)
            m = tn <= tf
            return m, np.where(m, tn, np.inf).min()

        stack = [0]
        while stack:
            node = stack.pop()
            tot_pops += 1
            kids = []
            for child in (node + 1, int(right[node])):
                m, near = slab(child)
                if not np.isfinite(near):
                    continue
                lid = int(leaf_id[child])
                if lid >= 0:
                    tot_visits += 1
                    lm = m.reshape(rows, LANES)
                    lr = lm.any(1)
                    tot_live_rows += int(lr.sum())
                    lanes = lm.sum(1)[lr]
                    tot_live_lanes += int(lanes.sum())
                    for c in lanes:
                        lane_hist[c] += 1
                    # exact MT on live rays -> best-t culling fidelity
                    live = np.nonzero(m)[0]
                    if live.size:
                        lo_, ld_ = po[live, None], pd[live, None]
                        h = np.cross(ld_, e2[lid][None])
                        a = (e1[lid][None] * h).sum(-1)
                        with np.errstate(divide="ignore",
                                         invalid="ignore"):
                            f = 1.0 / a
                            s = lo_ - v0[lid][None]
                            u = f * (s * h).sum(-1)
                            q = np.cross(s, e1[lid][None])
                            v = f * (ld_ * q).sum(-1)
                            t = f * (e2[lid][None] * q).sum(-1)
                        ok = ((u >= 0) & (u <= 1) & (v >= 0)
                              & (u + v <= 1) & (t > 1e-4)
                              & filled[lid][None]
                              & (t < best[live, None]))
                        t = np.where(ok, t, np.inf).min(1)
                        best[live] = np.minimum(best[live], t)
                else:
                    kids.append((near, child))
            for _, child in sorted(kids, reverse=True):  # near popped 1st
                stack.append(child)

    n_sampled_rays = len(sel) * R
    print(f"packet_model: {n_tris} tris, rows={rows}, "
          f"{'coherent' if coherent else 'incoherent'}, "
          f"{len(sel)} packets sampled ({n_sampled_rays} rays)")
    print(f"  node pops/packet:        {tot_pops / len(sel):10.0f}")
    print(f"  leaf visits/packet:      {tot_visits / len(sel):10.0f}")
    print(f"  live rows/visit:         {tot_live_rows / max(tot_visits, 1):10.2f}  (of {rows})")
    print(f"  live lanes/live row:     {tot_live_lanes / max(tot_live_rows, 1):10.2f}  (of {LANES})")
    cum = np.cumsum(lane_hist) / max(lane_hist.sum(), 1)
    for q in (8, 16, 32, 64):
        print(f"  P[lanes<={q}]:            {cum[q]:10.2%}")
    print(f"  row-gating saves:        {1 - tot_live_rows / max(tot_visits * rows, 1):10.2%} of rows")
    print(f"  lane util in live rows:  {tot_live_lanes / max(tot_live_rows * LANES, 1):10.2%}")


if __name__ == "__main__":
    main()
