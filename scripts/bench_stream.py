"""Dev benchmark: streaming traversal kernel vs gather walk on big scenes.

Usage: python scripts/bench_stream.py [n_tris] [n_rays]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from clive2_tpu.bvh.build import build_bvh, leaf_tables
from clive2_tpu.geometry import TriangleSoup
from clive2_tpu.ops import traverse_stream as ts
from clive2_tpu.ops.intersect import intersect_bvh_packed, pack_gather_walk


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    rng = np.random.default_rng(0)
    # clustered blob: fbm-ish dense geometry like the dragon stand-ins
    n_clusters = max(1, n_tris // 200)
    cc = rng.uniform(-4, 4, (n_clusters, 1, 1, 3))
    tris = (cc + rng.uniform(-0.8, 0.8, (n_clusters, 200, 1, 3))
            + rng.uniform(-0.05, 0.05, (n_clusters, 200, 3, 3)))
    tris = tris.reshape(-1, 3, 3)[:n_tris].astype(np.float32)
    soup = TriangleSoup.from_vertices(tris)

    t0 = time.time()
    bvh = build_bvh(soup)
    print(f"bvh build: {time.time()-t0:.1f}s nodes={bvh.n_nodes} "
          f"leaves={bvh.n_leaves}")

    t0 = time.time()
    packed = ts.pack_stream(bvh, soup)
    print(f"pack_stream: {time.time()-t0:.1f}s "
          f"top={packed['nodebox'].size//6} "
          f"fat={packed['leafblocks'].shape[0]} "
          f"smemKB={ts.smem_bytes(packed)/1024:.0f} "
          f"hbmMB={ts.hbm_bytes(packed)/2**20:.0f}")
    packed = {k: jnp.asarray(v) for k, v in packed.items()}

    # camera-like coherent rays from one side + some bounce-like random ones
    o = np.tile(np.array([[0.0, 0.0, 12.0]], np.float32), (n_rays, 1))
    px = rng.uniform(-5, 5, (n_rays, 2)).astype(np.float32)
    tgt = np.stack([px[:, 0], px[:, 1], np.zeros(n_rays, np.float32)], 1)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    stream = jax.jit(lambda o, d: ts.intersect_stream(o, d, packed,
                                                      sort=True))
    t0 = time.time()
    r1 = stream(o, d)
    jax.block_until_ready(r1)
    print(f"stream compile+run: {time.time()-t0:.1f}s")
    for trial in range(3):
        t0 = time.time()
        r1 = stream(o, d)
        jax.block_until_ready(r1)
        dt = time.time() - t0
        print(f"stream: {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.2f} Mrays/s")

    if "--check" in sys.argv:
        ga = {k: jnp.asarray(v)
              for k, v in pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        walk = jax.jit(lambda o, d: intersect_bvh_packed(o, d, ga))
        sl = slice(0, 65536)
        t0 = time.time()
        r0 = walk(o[sl], d[sl])
        jax.block_until_ready(r0)
        print(f"gather-walk compile+run (64k rays): {time.time()-t0:.1f}s")
        t0 = time.time()
        r0 = walk(o[sl], d[sl])
        jax.block_until_ready(r0)
        dt = time.time() - t0
        print(f"gather-walk: {dt*1e3:.1f} ms -> {65536/dt/1e6:.2f} Mrays/s")
        i0 = np.asarray(r0[0])
        i1 = np.asarray(r1[0][sl])
        print(f"id match: {(i0 == i1).mean()*100:.4f}% "
              f"({(i0 != i1).sum()} mismatches)")
        hit = i0 >= 0
        t_ok = np.allclose(np.asarray(r0[1])[hit], np.asarray(r1[1][sl])[hit],
                           atol=1e-4, rtol=1e-5)
        print(f"hits={hit.sum()} t close: {t_ok}")


if __name__ == "__main__":
    main()
