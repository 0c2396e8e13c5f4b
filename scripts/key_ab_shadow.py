"""Sort-key A/B for SHADOW (connection-cast) wavefronts (dev tool).

Connection casts are the largest ray population of a BDPT sample (up to
41 strategies/pixel) and the worst streaming regime in the DMA model.
Unlike bounce rays, BOTH endpoints are known before the cast — the sort
key can use the segment, not just the origin ray.  This script A/Bs
candidate keys on the exact host-side top-tree walk (same machinery as
scripts/dma_model.py) and reports, per key:

  * chunk-visits/ray (the MXU-drain bound driver for stream2), and
  * unique fat-leaf DMA visits per packet (the HBM-bytes driver),

both at the capped-t walk (the kernel's upper bound for shadow rays —
caps are static, culling only tightens further).

Candidates:
  entry      production key (_morton_key: entry-point major, octant minor)
  mid        Morton of the segment midpoint
  mid+oct    midpoint major, octant minor
  entry+tgt  entry Morton high bits, target Morton low bits
  seg        interleaved entry/target Morton (segment cell)

Usage: python scripts/key_ab_shadow.py [mesh.ply] [n_rays] [seed]
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
LANES = 128


def spread(x):
    x = x.astype(np.uint32)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton(p, lo, hi, bits=10):
    q = np.clip(((p - lo) / np.maximum(hi - lo, 1e-6)
                 * (1 << bits)).astype(np.uint32), 0, (1 << bits) - 1)
    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def main():
    import jax.numpy as jnp

    from clive2_tpu.bvh.build import build_bvh
    from clive2_tpu.ops.traverse_pallas2 import _morton_key
    from clive2_tpu.load import load_ply
    from scripts.dma_model import top_tree, walk_visits, packet_stats

    soup = load_ply(MESH)
    print(f"{MESH}: {len(soup)} tris; building BVH...", flush=True)
    bvh = build_bvh(soup)
    lo, hi = bvh.node_mins[0], bvh.node_maxes[0]
    ext = hi - lo

    rng = np.random.default_rng(SEED)

    def pts(seed, n):
        r = np.random.default_rng(seed)
        tri = soup.vertices[r.integers(0, len(soup), n)]
        b = r.dirichlet([1, 1, 1], n).astype(np.float32)
        return (tri * b[:, :, None]).sum(1)

    a, b = pts(SEED + 1, N_RAYS), pts(SEED + 2, N_RAYS)
    d = b - a
    dist = np.linalg.norm(d, axis=1, keepdims=True)
    d = (d / np.maximum(dist, 1e-9)).astype(np.float32)
    o = (a + 1e-3 * ext.max() * d).astype(np.float32)
    cap = dist[:, 0].astype(np.float32)

    childs, boxes, n_fat, _ = top_tree(bvh, 1)
    vr, vf = walk_visits(o, d, cap, childs, boxes)
    print(f"{len(vr)/N_RAYS:.2f} visits/ray (capped walk), "
          f"{n_fat} fat leaves", flush=True)

    octant = ((d[:, 0] > 0).astype(np.uint64) * 4
              + (d[:, 1] > 0).astype(np.uint64) * 2
              + (d[:, 2] > 0).astype(np.uint64))
    m_o = morton(o, lo, hi).astype(np.uint64)
    m_t = morton(b.astype(np.float32), lo, hi).astype(np.uint64)
    m_mid = morton(((o + b) * 0.5).astype(np.float32), lo, hi
                   ).astype(np.uint64)
    prod_key = np.asarray(_morton_key(jnp.asarray(o), jnp.asarray(d),
                                      jnp.asarray(lo), jnp.asarray(hi))
                          ).astype(np.uint64)
    # interleave entry/target morton bits (segment cell key)
    seg = 0
    for i in range(30):
        seg = seg | (((m_o >> np.uint64(i)) & 1) << np.uint64(2 * i + 1)) \
                  | (((m_t >> np.uint64(i)) & 1) << np.uint64(2 * i))

    keys = {
        "entry (prod)": prod_key,
        "origin+oct": (m_o << np.uint64(2)) | (octant >> np.uint64(1)),
        "mid": m_mid,
        "mid+oct": (m_mid << np.uint64(2)) | (octant >> np.uint64(1)),
        "entry+tgt": (prod_key.astype(np.uint64) << np.uint64(15))
                     | (m_t >> np.uint64(15)),
        "seg": seg,
    }

    width = int(vf.max()) + 1
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        rank = np.empty(N_RAYS, np.int64)
        rank[order] = np.arange(N_RAYS)
        ck = (rank[vr] // LANES) * width + vf
        cv = len(np.unique(ck)) / N_RAYS
        line = f"{name:14s} cv={cv:5.2f} mxu@{1/(cv*160e-9)/1e6:6.1f}M |"
        for rows in (32, 48):
            visits, _ = packet_stats(vr, vf, order, N_RAYS, rows)
            kb = visits * 5 * LANES * 64 * 2 / N_RAYS / 1e3
            line += f" R{rows}: {kb:6.1f}kB@{819e9/(kb*1e3)/1e6:6.1f}M"
        print(line, flush=True)


if __name__ == "__main__":
    main()
