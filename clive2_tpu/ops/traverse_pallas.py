"""Pallas TPU packet BVH traversal.

The performance-critical replacement for the XLA gather-based wavefront
walk in intersect.py (and the reference's per-thread stack traversal,
trace.metal:144-176).  Design:

  * One grid step processes a PACKET of ``BLOCK_RAYS`` rays held as
    [SUBLANES, 128] f32 component planes in VMEM.
  * The whole packet traverses with ONE shared scalar stack (SMEM
    scratch): a node is visited if ANY ray in the packet wants it.  Node
    AABBs and leaf triangles are read with scalar loads and broadcast into
    vector slab / Möller-Trumbore tests across all lanes — there are NO
    vector gathers anywhere, which is what makes this fast on TPU (XLA's
    dynamic gather costs ~50ns/row on v5e; a broadcast scalar load is
    ~1 cycle).
  * Leaves are fixed-width (MAX_MEMBERS slots, padded) so the triangle
    loop is a static unroll of masked vector MT tests.

Packet traversal wants ray coherence; the caller can pre-sort rays (see
sort_rays_morton) so packets share direction/origin locality.

Scene data layout (built by scene.py):
  nodef [n_nodes, 8]  f32: min.xyz, max.xyz, pad, pad
  nodei [n_nodes, 4]  i32: leaf_id (-1 inner), right_child, 0, 0
  leaff [n_leaves * K, 12] f32: v0.xyz, e1.xyz, e2.xyz, tri_idx_f, pad, pad
        (tri_idx stored as float; exact for < 2^24 triangles; -1 padding)

Whole-tree arrays live in VMEM — valid for scenes up to ~150k triangles
(v5e VMEM is ~16 MB); larger scenes fall back to the XLA walk.
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
BLOCK_RAYS = SUBLANES * LANES  # 1024
STACK_DEPTH = 256
INF = float("inf")


def _kernel(nodef, nodei, leaff, ox, oy, oz, dx, dy, dz, act,
            out_t, out_i, out_u, out_v, stack):
    tiny = jnp.float32(1e-30)

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < tiny,
                               jnp.where(d < 0, -tiny, tiny), d)

    invx, invy, invz = inv(dx[:]), inv(dy[:]), inv(dz[:])
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    active = act[:] > 0.0

    stack[0] = 0

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, bt, bi, bu, bv = c
        node = stack[sp - 1]
        sp = sp - 1

        bminx = nodef[node, 0]
        bminy = nodef[node, 1]
        bminz = nodef[node, 2]
        bmaxx = nodef[node, 3]
        bmaxy = nodef[node, 4]
        bmaxz = nodef[node, 5]

        t0x = (bminx - o_x) * invx
        t1x = (bmaxx - o_x) * invx
        t0y = (bminy - o_y) * invy
        t1y = (bmaxy - o_y) * invy
        t0z = (bminz - o_z) * invz
        t1z = (bmaxz - o_z) * invz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bt),
        )
        box_hit = (tmin <= tmax) & active
        any_hit = jnp.any(box_hit)

        leaf_id = nodei[node, 0]
        right = nodei[node, 1]
        is_leaf = leaf_id >= 0

        # inner node: push both children (left is node+1 in preorder)
        push = any_hit & (~is_leaf)

        @pl.when(push)
        def _():
            stack[sp] = right
            stack[sp + 1] = node + 1

        sp = jnp.where(push, sp + 2, sp)

        # leaf: static unroll over the fixed-width triangle slots
        def leaf_tests(args):
            bt, bi, bu, bv = args
            for k in range(MAX_LEAF):
                base = leaf_id * MAX_LEAF + k
                tri_f = leaff[base, 9]
                v0x = leaff[base, 0]
                v0y = leaff[base, 1]
                v0z = leaff[base, 2]
                e1x = leaff[base, 3]
                e1y = leaff[base, 4]
                e1z = leaff[base, 5]
                e2x = leaff[base, 6]
                e2y = leaff[base, 7]
                e2z = leaff[base, 8]

                # h = d x e2 (broadcast scalars against vector d)
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
                    & (t > DELTA) & (t < bt) & box_hit & (tri_f >= 0.0)
                )
                bt = jnp.where(ok, t, bt)
                bi = jnp.where(ok, tri_f.astype(jnp.int32), bi)
                bu = jnp.where(ok, u, bu)
                bv = jnp.where(ok, v, bv)
            return bt, bi, bu, bv

        bt, bi, bu, bv = jax.lax.cond(
            any_hit & is_leaf, leaf_tests, lambda args: args, (bt, bi, bu, bv)
        )
        return sp, bt, bi, bu, bv

    init = (
        jnp.int32(1),
        jnp.full((SUBLANES, LANES), INF, dtype=jnp.float32),
        jnp.full((SUBLANES, LANES), -1, dtype=jnp.int32),
        jnp.zeros((SUBLANES, LANES), dtype=jnp.float32),
        jnp.zeros((SUBLANES, LANES), dtype=jnp.float32),
    )
    _, bt, bi, bu, bv = jax.lax.while_loop(cond, body, init)
    out_t[:] = bt
    out_i[:] = bi
    out_u[:] = bu
    out_v[:] = bv


MAX_LEAF = 8  # must match bvh.build MAX_MEMBERS


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def _traverse_blocks(nodef, nodei, leaff, rays, n_blocks: int):
    """rays: dict of [n_blocks*SUBLANES, LANES] planes."""
    plane = lambda: pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[full(), full(), full()] + [plane()] * 7,
        out_specs=[plane()] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )(nodef, nodei, leaff,
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"])


def intersect_pallas(origin, direction, packed, active=None):
    """Closest-hit via the packet kernel.

    origin/direction [N, 3]; packed: dict(nodef, nodei, leaff).
    Returns (tri [N] i32, t [N], u [N], v [N]) matching intersect_bvh.
    """
    n = origin.shape[0]
    n_pad = max(BLOCK_RAYS, ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS)
    n_blocks = n_pad // BLOCK_RAYS

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * SUBLANES, LANES)

    act = jnp.ones((n,), jnp.float32) if active is None else active.astype(jnp.float32)
    rays = dict(
        ox=plane(origin[:, 0], 0.0), oy=plane(origin[:, 1], 0.0),
        oz=plane(origin[:, 2], 0.0),
        dx=plane(direction[:, 0], 1.0), dy=plane(direction[:, 1], 0.0),
        dz=plane(direction[:, 2], 0.0),
        act=plane(act, 0.0),
    )
    t, i, u, v = _traverse_blocks(
        packed["nodef"], packed["nodei"], packed["leaff"], rays, n_blocks
    )
    reshape = lambda a: a.reshape(n_pad)[:n]
    return reshape(i), reshape(t), reshape(u), reshape(v)


def pack_bvh(bvh, soup):
    """Host-side packing of a FlatBVH into the kernel's layout."""
    from ..bvh.build import leaf_tables

    n = bvh.n_nodes
    nodef = np.zeros((n, 8), dtype=np.float32)
    nodef[:, 0:3] = bvh.node_mins
    nodef[:, 3:6] = bvh.node_maxes
    nodei = np.zeros((n, 4), dtype=np.int32)
    nodei[:, 0] = bvh.leaf_id
    nodei[:, 1] = bvh.right_child

    tables = leaf_tables(bvh, soup)
    lk = bvh.n_leaves * MAX_LEAF
    leaff = np.zeros((lk, 12), dtype=np.float32)
    leaff[:, 0:3] = tables["v0"].reshape(lk, 3)
    leaff[:, 3:6] = tables["e1"].reshape(lk, 3)
    leaff[:, 6:9] = tables["e2"].reshape(lk, 3)
    leaff[:, 9] = tables["tri_index"].reshape(lk).astype(np.float32)
    return dict(nodef=nodef, nodei=nodei, leaff=leaff)


def vmem_bytes(packed) -> int:
    return sum(int(np.prod(a.shape)) * 4 for a in packed.values())
