"""Decompose the streaming kernel's time: node phase + DMA vs subtile
prefilter vs MT drain, on coherent (camera-like) and incoherent
(bounce-like) wavefronts.

Runs each CLIVE2_STREAM_DIAG ablation in a subprocess (the knob is read at
import).  Usage: python scripts/diag_stream.py [n_tris] [n_rays]
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 871_000
N_RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


IMPL = os.environ.get("CLIVE2_STREAM_IMPL", "2")


def make_scene_and_rays():
    import jax.numpy as jnp

    from clive2_tpu.bvh.build import build_bvh
    from clive2_tpu.geometry import TriangleSoup

    if IMPL == "1":
        from clive2_tpu.ops import traverse_stream as ts
        pack = ts.pack_stream
    else:
        from clive2_tpu.ops import traverse_stream2 as ts
        pack = ts.pack_stream2

    rng = np.random.default_rng(0)
    n_clusters = max(1, N_TRIS // 200)
    cc = rng.uniform(-4, 4, (n_clusters, 1, 1, 3))
    tris = (cc + rng.uniform(-0.8, 0.8, (n_clusters, 200, 1, 3))
            + rng.uniform(-0.05, 0.05, (n_clusters, 200, 3, 3)))
    tris = tris.reshape(-1, 3, 3)[:N_TRIS].astype(np.float32)
    soup = TriangleSoup.from_vertices(tris)
    bvh = build_bvh(soup)
    packed = {k: jnp.asarray(v) for k, v in pack(bvh, soup).items()}

    # coherent: camera-like fan from one point
    o_c = np.tile(np.array([[0.0, 0.0, 12.0]], np.float32), (N_RAYS, 1))
    px = rng.uniform(-5, 5, (N_RAYS, 2)).astype(np.float32)
    tgt = np.stack([px[:, 0], px[:, 1], np.zeros(N_RAYS, np.float32)], 1)
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)

    # incoherent: random origins inside the bbox, random directions
    o_i = rng.uniform(-5, 5, (N_RAYS, 3)).astype(np.float32)
    d_i = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    return packed, (jnp.asarray(o_c), jnp.asarray(d_c)), \
        (jnp.asarray(o_i), jnp.asarray(d_i))


def _count_impl2(ts, packed, o, d):
    """Drain counts per packet: raw kernel output row 0, last lane."""
    import jax.numpy as jnp

    from clive2_tpu.ops.traverse_pallas2 import _morton_key

    n = o.shape[0]
    key = _morton_key(o, d, packed["lo"], packed["hi"])
    order = jnp.argsort(key)
    o, d = o[order], d[order]
    n_pad = ((n + ts.BLOCK_RAYS - 1) // ts.BLOCK_RAYS) * ts.BLOCK_RAYS
    n_blocks = min(n_pad // ts.BLOCK_RAYS, ts.MAX_BLOCKS_PER_CALL)
    n_pad = n_blocks * ts.BLOCK_RAYS
    o, d = o[:n_pad], d[:n_pad]

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n_pad].set(x)
        return flat.reshape(n_blocks * ts.RAY_ROWS, ts.LANES)

    planes = dict(
        ox=plane(o[:, 0], 0.0), oy=plane(o[:, 1], 0.0),
        oz=plane(o[:, 2], 0.0), dx=plane(d[:, 0], 1.0),
        dy=plane(d[:, 1], 0.0), dz=plane(d[:, 2], 0.0),
        tm=plane(jnp.full((n_pad,), 1e30, jnp.float32), -1.0),
    )
    feat = ts.build_rayfeat(o, d, packed["ctr"])
    cols = packed["leafblocks"].shape[1] // ts.GROUPS
    t_pk, _ = ts._traverse_blocks(
        packed["nodebox"], packed["childs"], packed["leafblocks"],
        feat, planes, n_blocks, cols,
    )
    # diag "count" writes the packet's drain count across ray row 0
    raw = np.asarray(t_pk).reshape(n_blocks, ts.RAY_ROWS, ts.LANES)
    return raw[:, 0, 0]


def run_one():
    import jax

    if IMPL == "1":
        from clive2_tpu.ops import traverse_stream as ts
        isect = ts.intersect_stream
    else:
        from clive2_tpu.ops import traverse_stream2 as ts
        isect = ts.intersect_stream2

    diag = os.environ.get("CLIVE2_STREAM_DIAG", "")
    packed, coh, inc = make_scene_and_rays()
    # packed rides as a jit ARGUMENT: closing over it embeds the fat-leaf
    # table as a constant in the remote-compile payload (HTTP 413 at
    # ~440 MB, minutes of upload below that)
    jfn = jax.jit(lambda o, d, pk: isect(o, d, pk, sort=True))
    fn = lambda o, d: jfn(o, d, packed)
    def sync(r):
        # block_until_ready is NOT a reliable completion barrier on the
        # remote axon platform (measured 0.1 ms "runs" for 130 ms
        # programs); a scalar device->host transfer is.
        return float(np.asarray(r[1][:1])[0])

    for name, (o, d) in (("coherent", coh), ("incoherent", inc)):
        t0 = time.time()
        sync(fn(o, d))
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            r = fn(o, d)
            sync(r)
            best = min(best, time.time() - t0)
        extra = ""
        if diag == "count" and IMPL == "1":
            # out_u row 0 accumulated drain counts per packet (packets
            # stack along rows at RAY_ROWS stride)
            u = np.asarray(r[2]).reshape(-1)[: N_RAYS]
            nz = u[u > 0]
            extra = (f" drains/packet~{nz.mean():.0f}"
                     f" max {nz.max():.0f}" if nz.size else "")
        elif diag == "count" and IMPL == "2":
            # impl 2 stores the packet's drain count in the RAW kernel
            # output (row 0, last lane of each [128,128] packet block),
            # which the wrapper's unscramble drops — call the kernel
            # directly on one packet's worth of sorted rays
            import jax.numpy as jnp
            cnt = _count_impl2(ts, packed, o, d)
            extra = (f" drains/packet~{cnt.mean():.0f} max {cnt.max():.0f}")
        print(f"IMPL={IMPL} DIAG={diag or 'full':8s} {name:10s}: "
              f"{best*1e3:7.1f} ms -> {N_RAYS/best/1e6:6.2f} Mrays/s "
              f"(compile {compile_s:.0f}s){extra}", flush=True)


if __name__ == "__main__":
    if os.environ.get("DIAG_CHILD"):
        run_one()
    else:
        diags = (("", "nodrain", "nomt", "count") if IMPL == "1"
                 else ("", "nodrain", "count"))
        for diag in diags:
            env = dict(os.environ, DIAG_CHILD="1", CLIVE2_STREAM_DIAG=diag)
            subprocess.run([sys.executable, __file__] + sys.argv[1:],
                           env=env)
