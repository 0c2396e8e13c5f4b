"""Does the stream path need a FRESH Morton sort at every bounce depth?
(dev tool)

The per-cast sort glue (key + argsort + input gathers + output inverse
scatter, ~94 ns/ray measured round 2) is 25-50% of the projected stream2
cast time on big scenes.  But depth-(d+1) rays originate at depth-d hit
points: if depth-d rays were packet-coherent, their hits are spatially
local, so the INHERITED ray order may already cluster bounce origins —
position-major Morton keys mostly encode the origin anyway.  If
inherited ~ fresh-sorted in fat-leaf visits / MXU chunk-visits, the
integrator can sort once at depth 0 and use a cheap cumsum-scatter
stable partition (actives-first, order-preserving) at later depths.

Simulates on the exact host-side top-tree walk (dma_model machinery):
camera rays sorted by the production key -> closest hits -> cosine
bounce directions at the hit points, then compares
  fresh   : bounce rays re-sorted by the production Morton key
  inherit : bounce rays kept in the parent packet order
  shuffle : random order (the floor)
at depth 1, and again at depth 2 (bounce-of-bounce).

Usage: python scripts/sort_inherit_ab.py [mesh.ply] [n_rays] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

MESH = sys.argv[1] if len(sys.argv) > 1 else "resources/sponza_scale.ply"
N_RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0
LANES = 128


def report(tag, o, d, t_cap, order, childs, boxes, n_rays):
    from scripts.dma_model import walk_visits, packet_stats

    vr, vf = walk_visits(o, d, t_cap, childs, boxes)
    width = int(vf.max()) + 1 if len(vf) else 1
    rank = np.empty(n_rays, np.int64)
    rank[order] = np.arange(n_rays)
    ck = (rank[vr] // LANES) * width + vf
    cv = len(np.unique(ck)) / n_rays
    visits, _ = packet_stats(vr, vf, order, n_rays, 48)
    kb = visits * 5 * LANES * 64 * 2 / n_rays / 1e3
    print(f"  {tag:8s} cv={cv:5.2f} mxu@{1/(cv*160e-9)/1e6:6.1f}M  "
          f"R48 dma {kb:6.1f}kB/ray@{819e9/(kb*1e3)/1e6:6.1f}M",
          flush=True)


def main():
    import jax.numpy as jnp

    from clive2_tpu.bvh.build import build_bvh, leaf_tables
    from clive2_tpu.load import load_ply
    from clive2_tpu.ops.intersect import (intersect_bvh_packed,
                                          pack_gather_walk)
    from clive2_tpu.ops.sampling import orthonormal
    from clive2_tpu.ops.traverse_pallas2 import _morton_key
    from scripts.dma_model import top_tree

    rng = np.random.default_rng(SEED)
    soup = load_ply(MESH)
    print(f"{MESH}: {len(soup)} tris; building BVH...", flush=True)
    bvh = build_bvh(soup)
    leafs = leaf_tables(bvh, soup)
    ga = {k: jnp.asarray(v) for k, v in pack_gather_walk(bvh, leafs).items()}
    lo, hi = bvh.node_mins[0], bvh.node_maxes[0]
    ext = hi - lo
    childs, boxes, n_fat, _ = top_tree(bvh, 1)

    # depth-0 camera wavefront in RASTER order (the production wavefront
    # order: the Morton sort is internal to each cast and undone after)
    side = int(np.sqrt(N_RAYS))
    n0 = side * side
    eye = (lo + ext * [0.5, 0.5, 2.2]).astype(np.float32)
    px, py = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
    u = (px.reshape(-1) + 0.5) / side
    v = (py.reshape(-1) + 0.5) / side
    tgt = lo + ext * np.stack(
        [0.15 + 0.7 * u, 0.15 + 0.7 * v, np.full(n0, 0.5)], axis=1)
    o = np.tile(eye, (n0, 1)).astype(np.float32)
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    def key_of(oo, dd):
        return np.asarray(_morton_key(jnp.asarray(oo), jnp.asarray(dd),
                                      jnp.asarray(lo), jnp.asarray(hi)))

    print("depth 0 (raster camera wavefront):", flush=True)
    inf0 = np.full(n0, np.inf, np.float32)
    report("raster", o, d, inf0, np.arange(n0), childs, boxes, n0)
    report("fresh", o, d, inf0, np.argsort(key_of(o, d)), childs, boxes, n0)

    # connect-like mega cast: origins = raster-order camera hit points
    # (repeated per strategy, pixel-major like connect.py's flat layout),
    # targets = random scene surface points, t capped at the segment
    wi0, wt0, _, _ = (np.asarray(x) for x in
                      intersect_bvh_packed(jnp.asarray(o), jnp.asarray(d),
                                           ga))
    hit0 = wi0 >= 0
    hp = (o + d * wt0[:, None])[hit0]
    n_strat = 3
    co = np.repeat(hp, n_strat, axis=0)        # pixel-major, strategy-minor
    m = len(co)
    r = np.random.default_rng(SEED + 77)
    tri = soup.vertices[r.integers(0, len(soup), m)]
    bb = r.dirichlet([1, 1, 1], m).astype(np.float32)
    tp = (tri * bb[:, :, None]).sum(1)
    cd = tp - co
    dist = np.linalg.norm(cd, axis=1, keepdims=True)
    cd = (cd / np.maximum(dist, 1e-9)).astype(np.float32)
    co = (co + 1e-3 * ext.max() * cd).astype(np.float32)
    cap = dist[:, 0].astype(np.float32)
    print(f"connect-like cast ({n_strat} strategies, raster-pixel-major):",
          flush=True)
    report("raster", co, cd, cap, np.arange(m), childs, boxes, m)
    report("fresh", co, cd, cap, np.argsort(key_of(co, cd)), childs,
           boxes, m)

    N = n0
    parent_order = np.arange(n0)
    o, d = o, d                                # raster order, as traced

    inf_cap = np.full(N_RAYS, np.inf, np.float32)
    for depth in (1, 2):
        wi, wt, _, _ = (np.asarray(x) for x in
                        intersect_bvh_packed(jnp.asarray(o), jnp.asarray(d),
                                             ga))
        hit = wi >= 0
        print(f"depth {depth}: {hit.mean()*100:.0f}% parents hit", flush=True)
        p = (o + d * wt[:, None])[hit]
        n = np.asarray(soup.face_normals)[wi[hit]]
        n = np.where((n * d[hit]).sum(1, keepdims=True) > 0, -n, n)
        # cosine bounce about the surface normal
        r = np.random.default_rng(SEED + depth)
        u1, u2 = r.uniform(size=(2, len(p))).astype(np.float32)
        rad = np.sqrt(u1)
        phi = 2 * np.pi * u2
        t1, t2 = (np.asarray(x) for x in orthonormal(jnp.asarray(n)))
        nd = (rad * np.cos(phi))[:, None] * t1 \
            + (rad * np.sin(phi))[:, None] * t2 \
            + np.sqrt(np.maximum(1 - u1, 0))[:, None] * n
        nd = (nd / np.linalg.norm(nd, axis=1, keepdims=True)).astype(
            np.float32)
        no = (p + 1e-3 * ext.max() * nd).astype(np.float32)
        m = len(no)

        fresh_key = np.asarray(_morton_key(jnp.asarray(no), jnp.asarray(nd),
                                           jnp.asarray(lo), jnp.asarray(hi)))
        orders = {
            "inherit": np.arange(m),            # parent order, compacted
            "fresh": np.argsort(fresh_key),
            "shuffle": rng.permutation(m),
        }
        for tag, order in orders.items():
            report(tag, no, nd, inf_cap[:m], order, childs, boxes, m)

        # next depth continues from the FRESH-sorted wavefront (the
        # production behavior today); inherit-vs-fresh at depth 2 then
        # measures one unsorted step after one sorted step
        o, d = no[orders["fresh"]], nd[orders["fresh"]]
        inf_cap = inf_cap[:m]


if __name__ == "__main__":
    main()
