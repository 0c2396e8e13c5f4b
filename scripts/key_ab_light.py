"""Sort-key A/B for LIGHT-subpath wavefronts + gen-time-sort viability.

Light rays originate on the (small) emitter: the production entry-point
Morton key collapses them into one position cell, leaving only the 2
octant minor bits — light packets are direction-divergent at depth 0,
and depth-1 light origins (their first hits) inherit no locality.

Candidates (on a one-cell-origin hemisphere wavefront over the mesh):
  prod      production key (entry-point major, octant minor)
  pos+dir   30-bit position Morton (5 bits/axis) high, 15-bit direction
            Morton low — degrades to direction-Morton when positions
            collapse, to position-Morton when positions spread
  dir       direction Morton only

Reports depth-0 cv/DMA per key, then depth-1 INHERITED quality (the
gen-time-sort question: sort once at generation, inherit afterwards).

Usage: python scripts/key_ab_light.py [mesh.ply] [n_rays] [seed]
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


def spread(x):
    x = x.astype(np.uint64)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton(p, lo, hi, bits=10):
    q = np.clip(((p - lo) / np.maximum(hi - lo, 1e-6)
                 * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
    return (spread(q[:, 0]) << np.uint64(2)) \
        | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])


def posdir_key(o, d, lo, hi):
    mp = morton(o, lo, hi, bits=5)                 # 15 bits position
    md = morton(d, np.float32(-1.0), np.float32(1.0), bits=5)  # 15 bits dir
    return (mp << np.uint64(15)) | md


def main():
    import jax.numpy as jnp

    from clive2_tpu.bvh.build import build_bvh, leaf_tables
    from clive2_tpu.load import load_ply
    from clive2_tpu.ops.intersect import (intersect_bvh_packed,
                                          pack_gather_walk)
    from clive2_tpu.ops.sampling import orthonormal
    from clive2_tpu.ops.traverse_pallas2 import _morton_key
    from scripts.dma_model import top_tree
    from scripts.sort_inherit_ab import report

    rng = np.random.default_rng(SEED)
    soup = load_ply(MESH)
    print(f"{MESH}: {len(soup)} tris; building BVH...", flush=True)
    bvh = build_bvh(soup)
    leafs = leaf_tables(bvh, soup)
    ga = {k: jnp.asarray(v) for k, v in pack_gather_walk(bvh, leafs).items()}
    lo, hi = bvh.node_mins[0], bvh.node_maxes[0]
    ext = hi - lo

    # emitter: a small patch near the top of the scene, cosine-down rays
    c = (lo + ext * [0.5, 0.5, 0.92]).astype(np.float32)
    o = (c + ext * 0.02 * np.stack(
        [rng.uniform(-1, 1, N_RAYS), rng.uniform(-1, 1, N_RAYS),
         np.zeros(N_RAYS)], axis=1)).astype(np.float32)
    u1, u2 = rng.uniform(size=(2, N_RAYS)).astype(np.float32)
    rad, phi = np.sqrt(u1), 2 * np.pi * u2
    d = np.stack([rad * np.cos(phi), rad * np.sin(phi),
                  -np.sqrt(np.maximum(1 - u1, 0))], axis=1).astype(np.float32)

    childs, boxes, n_fat, _ = top_tree(bvh, 1)
    inf_cap = np.full(N_RAYS, np.inf, np.float32)

    prod = np.asarray(_morton_key(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(lo), jnp.asarray(hi))
                      ).astype(np.uint64)
    keys = {
        "prod": prod,
        "pos+dir": posdir_key(o, d, lo, hi),
        "dir": morton(d, np.float32(-1.0), np.float32(1.0)),
        "unsorted": np.arange(N_RAYS).astype(np.uint64),
    }
    print("depth 0 (light wavefront, one-cell origins):", flush=True)
    orders = {}
    for tag, key in keys.items():
        orders[tag] = np.argsort(key, kind="stable")
        report(tag, o, d, inf_cap, orders[tag], childs, boxes, N_RAYS)

    # depth 1: cosine bounce at the first hits, INHERITING each order
    wi, wt, _, _ = (np.asarray(x) for x in
                    intersect_bvh_packed(jnp.asarray(o), jnp.asarray(d), ga))
    hit = wi >= 0
    print(f"depth 1 ({hit.mean()*100:.0f}% hit), inherited order per key:",
          flush=True)
    p = (o + d * wt[:, None])
    nrm = np.asarray(soup.face_normals)[np.maximum(wi, 0)]
    nrm = np.where((nrm * d).sum(1, keepdims=True) > 0, -nrm, nrm)
    r = np.random.default_rng(SEED + 1)
    u1, u2 = r.uniform(size=(2, N_RAYS)).astype(np.float32)
    rad, phi = np.sqrt(u1), 2 * np.pi * u2
    t1, t2 = (np.asarray(x) for x in orthonormal(jnp.asarray(nrm)))
    nd = (rad * np.cos(phi))[:, None] * t1 \
        + (rad * np.sin(phi))[:, None] * t2 \
        + np.sqrt(np.maximum(1 - u1, 0))[:, None] * nrm
    nd = (nd / np.linalg.norm(nd, axis=1, keepdims=True)).astype(np.float32)
    no = (p + 1e-3 * ext.max() * nd).astype(np.float32)

    for tag in ("prod", "pos+dir", "dir", "unsorted"):
        sel = orders[tag][hit[orders[tag]]]        # survivors, parent order
        report(f"inh:{tag}", no[sel], nd[sel], inf_cap[:len(sel)],
               np.arange(len(sel)), childs, boxes, len(sel))
    # the ceiling: fresh sort of the bounce wavefront itself
    sel = np.nonzero(hit)[0]
    fk = np.asarray(_morton_key(jnp.asarray(no[sel]), jnp.asarray(nd[sel]),
                                jnp.asarray(lo), jnp.asarray(hi)))
    report("fresh", no[sel], nd[sel], inf_cap[:len(sel)], np.argsort(fk),
           childs, boxes, len(sel))


if __name__ == "__main__":
    main()
