"""Pallas dense Möller–Trumbore for small scenes.

The XLA chunked brute path (intersect.py:intersect_brute_chunked)
materializes [N, chunk, 3] intermediates in HBM — at 1080p that is ~800 MB
of traffic per traversal and it dominates the Cornell benchmark.  This
kernel keeps the whole triangle list in SMEM (10 floats per triangle,
<= 256 triangles) and streams each 1024-ray block through a fori_loop of
broadcast-scalar MT tests: zero HBM intermediates, pure VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DELTA

SUBLANES = 8
LANES = 128
BLOCK_RAYS = SUBLANES * LANES
INF = float("inf")


def _kernel(tris, n_tris_ref, ox, oy, oz, dx, dy, dz, act, tm,
            out_t, out_i, out_u, out_v):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    active = act[:] > 0.0
    n_tris = n_tris_ref[0]

    def body(k, c):
        bt, bi, bu, bv = c
        base = k * 10
        v0x = tris[base + 0]
        v0y = tris[base + 1]
        v0z = tris[base + 2]
        e1x = tris[base + 3]
        e1y = tris[base + 4]
        e1z = tris[base + 5]
        e2x = tris[base + 6]
        e2y = tris[base + 7]
        e2z = tris[base + 8]

        hx = d_y * e2z - d_z * e2y
        hy = d_z * e2x - d_x * e2z
        hz = d_x * e2y - d_y * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx = o_x - v0x
        sy = o_y - v0y
        sz = o_z - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (d_x * qx + d_y * qy + d_z * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > DELTA) & (t < bt) & active
        )
        bt = jnp.where(ok, t, bt)
        bi = jnp.where(ok, k, bi)
        bu = jnp.where(ok, u, bu)
        bv = jnp.where(ok, v, bv)
        return bt, bi, bu, bv

    # best-t starts at the caller's per-ray cap (shadow-ray pruning)
    init = (
        tm[:],
        jnp.full((SUBLANES, LANES), -1, dtype=jnp.int32),
        jnp.zeros((SUBLANES, LANES), dtype=jnp.float32),
        jnp.zeros((SUBLANES, LANES), dtype=jnp.float32),
    )
    bt, bi, bu, bv = jax.lax.fori_loop(0, n_tris, body, init)
    out_t[:] = bt
    out_i[:] = bi
    out_u[:] = bu
    out_v[:] = bv


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def _run(tris, n_tris, rays, n_blocks: int):
    plane = lambda: pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shape = (n_blocks * SUBLANES, LANES)
    out_shape = [
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
    ]
    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [plane()] * 8,
        out_specs=[plane()] * 4,
        out_shape=out_shape,
    )(tris, n_tris, rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"], rays["tm"])


def intersect_brute_pallas(origin, direction, brute, active=None,
                           t_max=None):
    """Dense-MT kernel; same contract as intersect_brute_chunked.
    ``t_max`` caps the search (misses still report t = inf).

    brute: dict(tris=[T*10] f32 SMEM table, n=[1] i32).
    """
    n = origin.shape[0]
    n_pad = max(BLOCK_RAYS, ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS)
    n_blocks = n_pad // BLOCK_RAYS

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * SUBLANES, LANES)

    act = jnp.ones((n,), jnp.float32) if active is None else active.astype(jnp.float32)
    tm = jnp.full((n,), INF, dtype=jnp.float32) if t_max is None else t_max
    rays = dict(
        ox=plane(origin[:, 0], 0.0), oy=plane(origin[:, 1], 0.0),
        oz=plane(origin[:, 2], 0.0),
        dx=plane(direction[:, 0], 1.0),
        dy=plane(direction[:, 1], 0.0),
        dz=plane(direction[:, 2], 0.0),
        act=plane(act, 0.0), tm=plane(tm, 0.0),
    )
    t, i, u, v = _run(brute["tris"], brute["n"], rays, n_blocks)
    reshape = lambda a: a.reshape(n_pad)[:n]
    i = reshape(i)
    t = jnp.where(i >= 0, reshape(t), INF)   # capped misses -> inf
    return i, t, reshape(u), reshape(v)


def pack_brute(soup) -> dict:
    """Flat SMEM triangle table: 10 floats per triangle (v0, e1, e2, pad)."""
    t = len(soup)
    tris = np.zeros((t, 10), dtype=np.float32)
    tris[:, 0:3] = soup.vertices[:, 0]
    tris[:, 3:6] = soup.vertices[:, 1] - soup.vertices[:, 0]
    tris[:, 6:9] = soup.vertices[:, 2] - soup.vertices[:, 0]
    return dict(tris=tris.reshape(-1), n=np.array([t], dtype=np.int32))
