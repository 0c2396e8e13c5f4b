"""Analytic DMA model for the streaming traversal kernels (dev tool).

The big-scene kernels (ops/traverse_stream.py VPU, ops/traverse_stream2.py
MXU) are bounded by fat-leaf HBM traffic.  This script computes, from an
exact host-side top-tree walk over real workload rays, the DMA bytes each
(ROWS, blocks_per_leaf, impl) configuration must move per ray — and the
HBM-bandwidth-bound throughput ceiling that implies — WITHOUT burning TPU
time on a knob sweep.

Per ray regime (coherent camera-like / incoherent bounce-like) it reports
fat-leaf visits per packet as an [upper, lower] band:
  * upper = slab tests against t_max=inf (no occlusion culling at all)
  * lower = slab tests against the ray's FINAL best t (perfect culling —
    what an oracle-ordered traversal with instant best-t refresh achieves)
The real kernels (front-to-back pops + drain-refreshed best-t planes) land
between the bounds.

Usage: python scripts/dma_model.py [mesh.ply] [n_rays] [seed]
Defaults: resources/sponza_scale.ply, 65536 rays.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

MESH = sys.argv[1] if len(sys.argv) > 1 else "resources/sponza_scale.ply"
N_RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0

HBM_BW = 819e9               # v5e HBM bytes/s (scaling-book figure)
LANES = 128
STREAM1_BLOCK = 16 * LANES * 4          # [16, 128*bpl] f32  -> 8 KB * bpl
STREAM2_BLOCK = 5 * LANES * 64 * 2      # [5*128*bpl, 64] bf16 -> 80 KB * bpl


def top_tree(bvh, bpl):
    """Replicates pack_stream's cut: SMEM top tree + fat-leaf ids."""
    from clive2_tpu.ops.traverse_stream import SUBTILES, _cut_mask

    is_leaf = bvh.leaf_id >= 0
    cut_mask, _ = _cut_mask(bvh, SUBTILES * bpl)
    cuts = np.nonzero(cut_mask)[0]
    cut_of = np.full(bvh.n_nodes, -1, dtype=np.int64)
    cut_of[cuts] = np.arange(len(cuts))
    under = np.zeros(bvh.n_nodes + 1, dtype=np.int64)
    np.add.at(under, cuts, 1)
    np.add.at(under, bvh.miss[cuts], -1)
    under = np.cumsum(under[:-1]) > 0
    top = np.nonzero(~is_leaf & ~under)[0]
    top_ord = np.full(bvh.n_nodes, -1, dtype=np.int64)
    top_ord[top] = np.arange(len(top))
    left = top + 1
    right = bvh.right_child[top].astype(np.int64)

    def encode(child):
        return np.where(cut_of[child] >= 0, -(cut_of[child] + 1),
                        top_ord[child])

    childs = np.stack([encode(left), encode(right)], 1).astype(np.int64)
    boxes = np.zeros((len(top), 2, 6), np.float32)
    boxes[:, 0, 0:3] = bvh.node_mins[left]
    boxes[:, 0, 3:6] = bvh.node_maxes[left]
    boxes[:, 1, 0:3] = bvh.node_mins[right]
    boxes[:, 1, 3:6] = bvh.node_maxes[right]
    ext = (bvh.node_maxes[cuts] - bvh.node_mins[cuts]).astype(np.float64)
    area = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
            + ext[:, 0] * ext[:, 2])
    return childs, boxes, len(cuts), area


def walk_visits(o, d, t_max, childs, boxes, depth=160):
    """Exact per-ray fat-leaf visit lists from a vectorized stack walk."""
    n = len(o)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1e-30, d), 1e30)
    stack = np.zeros((n, depth), np.int64)
    sp = np.ones(n, np.int64)            # root (top node 0) pre-pushed
    vis_r, vis_f = [], []
    while True:
        act = np.nonzero(sp > 0)[0]
        if not len(act):
            break
        sp[act] -= 1
        node = stack[act, sp[act]]
        for side in (0, 1):
            bx = boxes[node, side]
            t0 = (bx[:, 0:3] - o[act]) * inv[act]
            t1 = (bx[:, 3:6] - o[act]) * inv[act]
            tn = np.minimum(t0, t1).max(1)
            tf = np.maximum(t0, t1).min(1)
            hit = (tn <= tf) & (tf >= 0) & (tn <= t_max[act])
            ch = childs[node, side]
            fat = ch < 0
            rec = hit & fat
            if rec.any():
                vis_r.append(act[rec])
                vis_f.append(-(ch[rec] + 1))
            push = hit & ~fat
            if push.any():
                idx = act[push]
                stack[idx, sp[idx]] = ch[push]
                sp[idx] += 1
                if (sp[idx] >= depth).any():
                    raise RuntimeError("stack overflow in host walk")
    return (np.concatenate(vis_r) if vis_r else np.zeros(0, np.int64),
            np.concatenate(vis_f) if vis_f else np.zeros(0, np.int64))


def subleaf_boxes(bvh, bpl):
    """[n_fat, max_subleaves, 6] SAH sub-leaf AABBs per fat leaf (slot
    order of pack_stream/pack_stream2); empty slots get never-hit boxes."""
    from clive2_tpu.ops.traverse_stream import SUBTILES, _cut_mask

    max_sub = SUBTILES * bpl
    cut_mask, _ = _cut_mask(bvh, max_sub)
    cuts = np.nonzero(cut_mask)[0]
    is_leaf = bvh.leaf_id >= 0
    leaf_nodes = np.nonzero(is_leaf)[0]
    fat_ids = np.searchsorted(cuts, leaf_nodes, side="right") - 1
    first = np.full(len(cuts), len(leaf_nodes), dtype=np.int64)
    np.minimum.at(first, fat_ids, np.arange(len(leaf_nodes)))
    sub_idx = np.arange(len(leaf_nodes)) - first[fat_ids]
    boxes = np.full((len(cuts), max_sub, 6), np.nan, np.float32)
    boxes[fat_ids, sub_idx, 0:3] = bvh.node_mins[leaf_nodes]
    boxes[fat_ids, sub_idx, 3:6] = bvh.node_maxes[leaf_nodes]
    present = np.zeros((len(cuts), max_sub), bool)
    present[fat_ids, sub_idx] = True
    boxes[~present] = 0.0
    boxes[~present, 0:3] = 1e30      # never hit
    boxes[~present, 3:6] = -1e30
    return boxes, present


def subleaf_liveness(o, d, t_max, vis_r, vis_f, boxes, present, order,
                     n_rays, rows):
    """Mean live sub-leaf fraction per (chunk, fat) and (packet, fat)
    group — the compute / DMA cut factors a sub-leaf-gated drain could
    reach."""
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1e-30, d), 1e30)
    bx = boxes[vis_f]                                  # [V, S, 6]
    ov, iv = o[vis_r][:, None, :], inv[vis_r][:, None, :]
    t0 = (bx[:, :, 0:3] - ov) * iv
    t1 = (bx[:, :, 3:6] - ov) * iv
    tn = np.minimum(t0, t1).max(2)
    tf = np.maximum(t0, t1).min(2)
    live = (tn <= tf) & (tf >= 0) & (tn <= t_max[vis_r][:, None])  # [V, S]
    rank = np.empty(n_rays, np.int64)
    rank[order] = np.arange(n_rays)
    out = []
    for grp_rows in (1, rows):                 # 1 row = chunk, rows = packet
        gid = (rank[vis_r] // (grp_rows * LANES)) * (vis_f.max() + 1) + vis_f
        ug, ginv = np.unique(gid, return_inverse=True)
        glive = np.zeros((len(ug), live.shape[1]), bool)
        np.logical_or.at(glive, ginv, live)
        gpres = present[(ug % (vis_f.max() + 1)).astype(np.int64)]
        frac = glive.sum(1) / np.maximum(gpres.sum(1), 1)
        out.append(frac.mean())
    return out                                  # [chunk_frac, packet_frac]


def packet_stats(vis_r, vis_f, order, n_rays, rows):
    """Unique fat-leaf visits per packet of rows*128 Morton-sorted rays."""
    rank = np.empty(n_rays, np.int64)
    rank[order] = np.arange(n_rays)
    pkt = rank[vis_r] // (rows * LANES)
    n_pkt = int(np.ceil(n_rays / (rows * LANES)))
    key = pkt * (vis_f.max() + 1) + vis_f
    uniq = np.unique(key)
    visits = len(uniq)
    return visits, n_pkt


def hot_leaf_coverage(vis_r, vis_f, order, n_rays, rows, n_fat, area,
                      ks=(64, 128, 192)):
    """Would a static VMEM-resident cache of the K hottest fat leaves cut
    DMA?  Reports, per K, the fraction of (packet, fat-leaf) DMA visits
    that land on the top-K leaves under two rankings: 'oracle' (by this
    workload's own visit counts — an upper bound no static choice beats)
    and 'area' (by node surface area — computable at pack time).  Each
    resident leaf costs STREAM2_BLOCK bytes of VMEM (~80 KB at bpl=1),
    so K is bounded by ~100-150 on a 16 MB-VMEM part."""
    rank = np.empty(n_rays, np.int64)
    rank[order] = np.arange(n_rays)
    pkt = rank[vis_r] // (rows * LANES)
    key = pkt * (vis_f.max() + 1) + vis_f
    uniq_f = np.unique(key) % (vis_f.max() + 1)    # fat id of each DMA visit
    counts = np.bincount(uniq_f.astype(np.int64), minlength=n_fat)
    total = counts.sum()
    out = {}
    for name, ranking in (("oracle", np.argsort(-counts)),
                          ("area", np.argsort(-area))):
        out[name] = [counts[ranking[:k]].sum() / max(total, 1) for k in ks]
    return ks, out


def leaf_major_stats(vis_r, vis_f, n_rays, n_fat):
    """Bound for a hypothetical LEAF-MAJOR drain: compact every ray
    interested in fat leaf L into dense 128-ray chunks and stream each
    live leaf once per wavefront.  Returns (chunk-visits/ray, interest
    pairs/ray, live-leaf fraction).  The MXU work becomes
    sum_L ceil(n_L/128) matmuls (vs the block-major unique-(chunk,leaf)
    count); the fat-leaf DMA becomes one block per LIVE leaf per pass
    (vs one per interested packet); the new glue is emitting + binning
    the (ray, leaf) pairs (a sort or segment scatter over `pairs` keys)
    plus gathering each pair's ray features ([K=64] bf16 = 128 B/pair if
    done in HBM)."""
    width = int(vis_f.max()) + 1 if len(vis_f) else 1
    counts = np.bincount(vis_f.astype(np.int64), minlength=n_fat)
    live = counts > 0
    cv = np.ceil(counts[live] / LANES).sum() / n_rays
    return cv, len(vis_r) / n_rays, live.sum() / max(n_fat, 1)


def main():
    import jax.numpy as jnp

    from clive2_tpu.bvh.build import build_bvh, leaf_tables
    from clive2_tpu.load import load_ply
    from clive2_tpu.ops.intersect import (intersect_bvh_packed,
                                          pack_gather_walk)
    from clive2_tpu.ops.traverse_pallas2 import _morton_key

    rng = np.random.default_rng(SEED)
    soup = load_ply(MESH)
    print(f"{MESH}: {len(soup)} tris; building BVH...", flush=True)
    bvh = build_bvh(soup)
    leafs = leaf_tables(bvh, soup)
    ga = {k: jnp.asarray(v) for k, v in pack_gather_walk(bvh, leafs).items()}
    lo, hi = bvh.node_mins[0], bvh.node_maxes[0]
    ext = hi - lo

    # --- workloads -------------------------------------------------------
    def camera_rays(n):
        eye = (lo + ext * [0.5, 0.5, 2.2]).astype(np.float32)
        tgt = lo + ext * rng.uniform(0.15, 0.85, (n, 3))
        o = np.tile(eye, (n, 1)).astype(np.float32)
        d = (tgt - o).astype(np.float32)
        return o, d / np.linalg.norm(d, axis=1, keepdims=True)

    def bounce_rays(n):
        tri = soup.vertices[rng.integers(0, len(soup), n)]
        b = rng.dirichlet([1, 1, 1], n).astype(np.float32)
        p = (tri * b[:, :, None]).sum(1)
        nrm = soup.face_normals[rng.integers(0, len(soup), n)]
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = (p + 1e-3 * ext.max() * d).astype(np.float32)
        return o, d

    def shadow_rays(n):
        """Connection casts: surface point -> surface point, t capped at
        the segment length (the largest ray population of a BDPT sample —
        up to 41 strategies/pixel)."""
        def pts(seed):
            r = np.random.default_rng(seed)
            tri = soup.vertices[r.integers(0, len(soup), n)]
            b = r.dirichlet([1, 1, 1], n).astype(np.float32)
            return (tri * b[:, :, None]).sum(1)

        a, bpt = pts(SEED + 1), pts(SEED + 2)
        d = bpt - a
        dist = np.linalg.norm(d, axis=1, keepdims=True)
        d = (d / np.maximum(dist, 1e-9)).astype(np.float32)
        o = (a + 1e-3 * ext.max() * d).astype(np.float32)
        return o, d, dist[:, 0].astype(np.float32)

    for regime, mk in (("coherent", camera_rays),
                       ("incoherent", bounce_rays),
                       ("shadow", shadow_rays)):
        out = mk(N_RAYS)
        o, d = out[0], out[1]
        cap = out[2] if len(out) > 2 else None
        wi, wt, _, _ = (np.asarray(x) for x in
                        intersect_bvh_packed(jnp.asarray(o), jnp.asarray(d),
                                             ga))
        best_t = np.where(wi >= 0, wt, np.inf).astype(np.float32)
        if cap is not None:
            # capped casts never look past the segment; the kernel's
            # best-t plane starts at the cap, so even the "upper" bound
            # should use it
            best_t = np.minimum(best_t, cap)
        key = np.asarray(_morton_key(jnp.asarray(o), jnp.asarray(d),
                                     jnp.asarray(lo), jnp.asarray(hi)))
        order = np.argsort(key)
        print(f"\n== {regime}: hitrate {(wi >= 0).mean():.3f}")
        for bpl in (1, 2, 4):
            childs, boxes, n_fat, fat_area = top_tree(bvh, bpl)
            upper_cap = (np.full(N_RAYS, np.inf, np.float32)
                         if cap is None else cap)
            for bound, tcap in (("upper", upper_cap),
                                ("lower", best_t)):
                vr, vf = walk_visits(o, d, tcap, childs, boxes)
                per_ray = len(vr) / N_RAYS
                # stream2 MXU compute bound: the drain runs one matmul
                # per LIVE (fat leaf, 128-ray chunk) pair — a quantity
                # independent of ROWS.  t_chunk ~ 106 ns MXU (2*5*128*
                # 128*128 flops @ 197 Tflops bf16) + ~50 ns elementwise.
                rank = np.empty(N_RAYS, np.int64)
                rank[order] = np.arange(N_RAYS)
                ck = (rank[vr] // LANES) * (vf.max() + 1) + vf
                cv = len(np.unique(ck)) / N_RAYS * bpl  # chunks scale w/ bpl
                mxu_mrays = 1.0 / (cv * 160e-9) / 1e6
                sub = ""
                if bpl == 1:
                    boxes_s, present_s = subleaf_boxes(bvh, bpl)
                    cf, pf = subleaf_liveness(o, d, tcap, vr, vf, boxes_s,
                                              present_s, order, N_RAYS, 32)
                    sub = f" sublive c{cf:.2f}/p{pf:.2f}"
                line = (f"bpl={bpl} fats={n_fat:6d} {bound}: "
                        f"{per_ray:6.2f} visits/ray "
                        f"{cv:6.2f} chunkvisits/ray "
                        f"mxu@{mxu_mrays:7.1f}M{sub} |")
                for rows in (8, 16, 32, 48):
                    visits, n_pkt = packet_stats(vr, vf, order, N_RAYS,
                                                 rows)
                    for impl, blk in (("s1", STREAM1_BLOCK),
                                      ("s2", STREAM2_BLOCK)):
                        bytes_per_ray = visits * blk * bpl / N_RAYS
                        mrays = HBM_BW / bytes_per_ray / 1e6
                        line += (f" R{rows}/{impl}:"
                                 f"{bytes_per_ray / 1e3:6.1f}kB"
                                 f"@{mrays:7.1f}M")
                print(line, flush=True)
                if bpl == 1:
                    lm_cv, lm_pairs, lm_live = leaf_major_stats(
                        vr, vf, N_RAYS, n_fat)
                    lm_mxu = 1.0 / (lm_cv * 160e-9) / 1e6
                    lm_bytes = (lm_live * n_fat * STREAM2_BLOCK / N_RAYS
                                + lm_pairs * 128)   # leaf blocks + rayfeat
                    print(f"    leaf-major bound: {lm_cv:6.2f} "
                          f"chunkvisits/ray mxu@{lm_mxu:7.1f}M  "
                          f"{lm_pairs:5.1f} pairs/ray  "
                          f"{lm_live*100:4.1f}% leaves live  "
                          f"dma {lm_bytes/1e3:6.1f}kB/ray"
                          f"@{HBM_BW/lm_bytes/1e6:7.1f}M", flush=True)
                    ks, cov = hot_leaf_coverage(vr, vf, order, N_RAYS, 32,
                                                n_fat, fat_area)
                    print("    hot-leaf DMA coverage (R32): " + "  ".join(
                        f"{nm} top{k}={c*100:4.1f}%"
                        for nm in ("oracle", "area")
                        for k, c in zip(ks, cov[nm])), flush=True)


if __name__ == "__main__":
    main()
