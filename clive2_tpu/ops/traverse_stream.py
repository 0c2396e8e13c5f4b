"""Pallas TPU streaming packet traversal for large scenes (>100k tris).

The v2 packet kernel (traverse_pallas2.py) keeps every inner node in SMEM
(~56 B each) and the whole leaf table in VMEM, capping scenes around 100k
triangles.  This kernel removes both ceilings with a two-level scheme:

  * The SAH tree is CUT at subtrees holding <= 16 leaves (<= 128 triangles).
    Only the top tree above the cuts lives in SMEM — 32 B per 128
    triangles with bf16-packed (min,max) box words (directed rounding,
    conservative slab test; see _pack_minmax), so ~3M triangles fit the
    800 KB budget at blocks_per_leaf=1.
  * Each cut subtree becomes a "fat leaf": one [16, 128] f32 block in HBM
    (attribute-major: rows 0-9 = v0/e1/e2/tri per slot, rows 10-15 = the
    slot's sub-leaf AABB).  Slots group 8-by-8 into the cut subtree's
    original SAH leaves, so the per-subtile AABBs retain full SAH culling
    quality inside the fat leaf.
  * Traversal runs in two interleaved phases: the node phase pops SMEM
    inner nodes and, on hitting a fat-leaf child, STARTS an async DMA of
    its block into a VMEM ring (NBUF slots) and keeps walking; the drain
    phase (queue full or stack empty) waits the oldest DMA and runs the
    transposed Möller-Trumbore over the block, subtile by subtile, with a
    vectorized sub-leaf box prefilter that skips subtiles no ray reaches.
    Node work and leaf work thus overlap the DMA latency by construction
    (pallas_guide double-buffering pattern).

Replaces the reference's size-independent per-thread stack traversal
(/root/reference/src/trace.metal:144-176) for scenes the SMEM-resident
kernel cannot hold.  Same contract as intersect_pallas2/intersect_bvh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DELTA
from .traverse_pallas2 import _morton_key

import os

SUBLANES = 8
LANES = 128
# ray rows per packet: packets are [RAY_ROWS, 128] = RAY_ROWS*128 rays.
# Bigger packets amortize the scalar-core cost of stack pops, loop control,
# and DMA issue over more rays (the scalar pipe, not the VPU, bounds this
# kernel); the sweep knob exists for measurement.
# 32 rows measured best on sponza-256 (0.237 @16 -> 0.260 @32 -> 0.266
# @64 Mrays/s): each fat-leaf DMA amortizes over more rays
RAY_ROWS = int(os.environ.get("CLIVE2_STREAM_ROWS", 32))
assert RAY_ROWS % SUBLANES == 0, "stream packets are [8,128]-tile multiples"
BLOCK_RAYS = RAY_ROWS * LANES
# max packets per pallas_call: ONE kernel execution must stay well under
# the TPU's per-launch watchdog.  An 18.7M-ray mega-cast (~9000 packets)
# over the 1.3M-tri sponza ran for tens of seconds inside a single launch
# and died with "UNAVAILABLE: TPU device error" — the identical rays pass
# when split into bounded launches (measured: every 1M-ray slice of the
# failing dispatch is individually green).  Oversized dispatches lax.map
# over sub-dispatches of this many packets; launch overhead is ~ms.
MAX_BLOCKS_PER_CALL = int(os.environ.get("CLIVE2_STREAM_MAX_BLOCKS", 512))
STACK_DEPTH = 192
SUBTILES = 16                          # sub-leaves per fat leaf
SUB_SLOTS = 8                          # triangles per sub-leaf
FAT_TRIS = SUBTILES * SUB_SLOTS        # 128
BLOCK_ROWS = 16                        # attribute rows per fat-leaf block
NBUF = int(os.environ.get("CLIVE2_STREAM_NBUF", 4))  # DMA ring (pow of 2)
assert NBUF >= 2 and (NBUF & (NBUF - 1)) == 0, \
    "CLIVE2_STREAM_NBUF must be a power of two >= 2 (ring slots are " \
    "masked with qhead & (NBUF-1))"
INF = float("inf")
# measurement-only ablations (scripts/bench_stream.py --diag):
#   "nodrain"  drain waits the DMA then discards the block (node phase +
#              DMA cost only)
#   "nomt"     drain runs the subtile box prefilter but skips the MT
#   "count"    full kernel, but out_u[0, 0] reports the number of fat-leaf
#              drains this packet performed (corrupts results; diag only)
STREAM_DIAG = os.environ.get("CLIVE2_STREAM_DIAG", "")
# drain implementation (measured on the 871k-tri blob, 1M rays, v5e):
#   "v1"  transposed [8 tris x 128 rays] per-row MT — ~300 us per drained
#         block: LATENCY-bound on its serial [1, 128] reduce +
#         read-modify-write chain per (subtile, row), not VPU throughput
#   "v2"  per-triangle VMEM-scalar broadcast over the whole packet —
#         ~220 us: the ~10 VMEM->SREG scalar reads per triangle each cost
#         ~150 cycles and dominate
#   "v3"  (default) rays-in-sublanes x tris-in-lanes dense cross: per ray
#         lane-column, one [RAY_ROWS, cols] op block tests 32 rays against
#         every triangle of the fat leaf at full VPU efficiency — tri
#         attributes are [1, cols] sublane-broadcasts, ray attributes are
#         [rows, 1] lane-broadcasts (both native), zero scalar reads, and
#         best-hit state merges into registers per lane group
STREAM_DRAIN = os.environ.get("CLIVE2_STREAM_DRAIN", "v3")


def _make_kernel(any_hit: bool):
    """``any_hit`` compiles the shadow-ray variant (first-hit termination;
    see traverse_pallas2._make_kernel for the contract)."""
    return functools.partial(_kernel, any_hit)


def _kernel(any_hit, nodebox, childs, leafblocks,
            ox, oy, oz, dx, dy, dz, act, tm,
            out_t, out_i, out_u, out_v,
            stack, blocks, sem):
    n_subtiles = leafblocks.shape[2] // SUB_SLOTS
    assert ox.shape == (RAY_ROWS, LANES)
    tiny = jnp.float32(1e-30)

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < tiny,
                               jnp.where(d < 0, -tiny, tiny), d)

    invx, invy, invz = inv(dx[:]), inv(dy[:]), inv(dz[:])
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    active = act[:] > 0.0

    # outputs double as the best-hit accumulators; best-t starts at the
    # caller's per-ray cap (shadow-ray pruning; inf when uncapped)
    out_t[:] = tm[:]
    out_i[:] = jnp.full((RAY_ROWS, LANES), -1, dtype=jnp.int32)
    out_u[:] = jnp.zeros((RAY_ROWS, LANES), dtype=jnp.float32)
    out_v[:] = jnp.zeros((RAY_ROWS, LANES), dtype=jnp.float32)

    def box_test(node, base, bt, alive):
        # bf16-packed boxes: 3 SMEM words per child box (see _pack_minmax
        # — min/max pairs with directed rounding, conservative slab test)
        off = node * 6 + (base >> 1)
        w0, w1, w2 = nodebox[off + 0], nodebox[off + 1], nodebox[off + 2]
        # Mosaic's tpu.bitcast only accepts VECTOR operands (interpret
        # mode accepts scalars — caught by the round-3 hardware gate):
        # splat the packed SMEM word to one [1, LANES] lane row first;
        # the slab arithmetic below broadcasts it across RAY_ROWS anyway.
        bc = lambda w: jax.lax.bitcast_convert_type(
            jnp.full((1, LANES), w, dtype=jnp.int32), jnp.float32)
        t0x = (bc(w0 << 16) - o_x) * invx
        t1x = (bc(w0 & jnp.int32(-65536)) - o_x) * invx
        t0y = (bc(w1 << 16) - o_y) * invy
        t1y = (bc(w1 & jnp.int32(-65536)) - o_y) * invy
        t0z = (bc(w2 << 16) - o_z) * invz
        t1z = (bc(w2 & jnp.int32(-65536)) - o_z) * invz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bt),
        )
        hit = (tmin <= tmax) & alive
        return hit, jnp.where(hit, tmin, INF)

    def alive_now():
        return (active & (out_i[:] < 0)) if any_hit else active

    # ---- drain v2: per-triangle scalar broadcast over the whole packet -----
    # Each triangle's 10 attributes are read as VMEM SCALARS and splatted
    # into full-packet [RAY_ROWS, 128] elementwise Möller-Trumbore — no
    # [1, 128] row slices, no cross-sublane reductions, and best-hit state
    # rides in registers with one ref read-modify-write per subtile.  The
    # multi-tile ops keep the VPU pipeline full where v1's single-tile
    # dependent chain stalled on op latency (~10x measured).
    def _drain_v2(slot):
        alive = alive_now()
        shape = (RAY_ROWS, LANES)

        def sc(r, k):
            return blocks[slot, r, k]

        for j in range(n_subtiles):
            base = j * SUB_SLOTS
            # subtile AABB (uniform across its 8 slots): 6 scalar reads,
            # one full-packet slab test
            t0x = (sc(10, base) - o_x) * invx
            t1x = (sc(13, base) - o_x) * invx
            t0y = (sc(11, base) - o_y) * invy
            t1y = (sc(14, base) - o_y) * invy
            t0z = (sc(12, base) - o_z) * invz
            t1z = (sc(15, base) - o_z) * invz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), out_t[:]),
            )
            box_ok = (tmin <= tmax) & alive
            has_tri = sc(9, base) >= 0.0
            for c in range(1, SUB_SLOTS):
                has_tri = has_tri | (sc(9, base + c) >= 0.0)
            go = jnp.any(box_ok) & has_tri

            @pl.when(go)
            def _(base=base, box_ok=box_ok):
                cur_t = out_t[:]
                cur_i = out_i[:]
                cur_u = out_u[:]
                cur_v = out_v[:]
                for c in range(SUB_SLOTS):
                    k = base + c
                    tri_f = sc(9, k)
                    v0x, v0y, v0z = sc(0, k), sc(1, k), sc(2, k)
                    e1x, e1y, e1z = sc(3, k), sc(4, k), sc(5, k)
                    e2x, e2y, e2z = sc(6, k), sc(7, k), sc(8, k)
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
                        (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                        & (u + v <= 1.0) & (t > DELTA) & (t < cur_t)
                        & box_ok & (tri_f >= 0.0)
                    )
                    cur_t = jnp.where(ok, t, cur_t)
                    cur_i = jnp.where(ok, jnp.int32(tri_f), cur_i)
                    if not any_hit:   # shadow casts never read u/v
                        cur_u = jnp.where(ok, u, cur_u)
                        cur_v = jnp.where(ok, v, cur_v)
                out_t[:] = cur_t
                out_i[:] = cur_i
                if not any_hit:
                    out_u[:] = cur_u
                    out_v[:] = cur_v

    # ---- drain v3: rays-in-sublanes x tris-in-lanes dense cross ------------
    # One op block per ray lane-column: the 32 rays of packet lane l (a
    # [RAY_ROWS, 1] slice, lane-broadcast) against ALL fat-leaf triangles
    # ([1, cols] attribute rows, sublane-broadcast) — every [8, 128] tile
    # issue performs 1024 distinct ray-triangle tests, there are no
    # VMEM scalar reads (v2's wall) and no [1, 128] ref RMWs (v1's wall);
    # per-lane best-hit folds into full-packet registers with a lane mask
    # and the output refs are written once per block.  The per-slot AABB
    # rows (10-15) double as an in-op prefilter term replacing v1's
    # subtile gating.
    def _drain_v3(slot):
        alive = alive_now()
        cols = leafblocks.shape[2]
        shape_c = (RAY_ROWS, cols)

        def blk(r):
            return jnp.broadcast_to(blocks[slot, r:r + 1, :], shape_c)

        v0x, v0y, v0z = blk(0), blk(1), blk(2)
        e1x, e1y, e1z = blk(3), blk(4), blk(5)
        e2x, e2y, e2z = blk(6), blk(7), blk(8)
        tri_f = blk(9)
        bmnx, bmny, bmnz = blk(10), blk(11), blk(12)
        bmxx, bmxy, bmxz = blk(13), blk(14), blk(15)
        tri_ok = tri_f >= 0.0

        lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_ROWS, LANES), 1)
        acc_t = out_t[:]
        acc_i = out_i[:]
        acc_u = out_u[:]
        acc_v = out_v[:]

        for l in range(LANES):
            def col(a):
                return jnp.broadcast_to(a[:, l:l + 1], shape_c)

            rox, roy, roz = col(o_x), col(o_y), col(o_z)
            rdx, rdy, rdz = col(d_x), col(d_y), col(d_z)
            rvx, rvy, rvz = col(invx), col(invy), col(invz)
            abt_col = acc_t[:, l:l + 1]                    # [R, 1]
            abt = jnp.broadcast_to(abt_col, shape_c)
            rok = col(alive.astype(jnp.float32)) > 0.0

            # per-slot sub-leaf AABB prefilter, fused into the mask
            t0x = (bmnx - rox) * rvx
            t1x = (bmxx - rox) * rvx
            t0y = (bmny - roy) * rvy
            t1y = (bmxy - roy) * rvy
            t0z = (bmnz - roz) * rvz
            t1z = (bmxz - roz) * rvz
            btmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            btmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), abt),
            )
            box_ok = (btmin <= btmax) & rok & tri_ok

            hx = rdy * e2z - rdz * e2y
            hy = rdz * e2x - rdx * e2z
            hz = rdx * e2y - rdy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / a
            sx = rox - v0x
            sy = roy - v0y
            sz = roz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (rdx * qx + rdy * qy + rdz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            ok = (
                (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > DELTA) & (t < abt) & box_ok
            )
            t = jnp.where(ok, t, INF)
            t_red = jnp.min(t, axis=1, keepdims=True)      # [R, 1]
            found = t_red < abt_col                        # [R, 1]
            is_best = (t == jnp.broadcast_to(t_red, shape_c)) & ok
            pick = lambda val: jnp.max(
                jnp.where(is_best, val, -jnp.float32(INF)),
                axis=1, keepdims=True,
            )
            sel_i = pick(tri_f)

            upd = (lane == l) & jnp.broadcast_to(found, (RAY_ROWS, LANES))
            bc = lambda r: jnp.broadcast_to(r, (RAY_ROWS, LANES))
            acc_t = jnp.where(upd, bc(t_red), acc_t)
            acc_i = jnp.where(upd, bc(sel_i.astype(jnp.int32)), acc_i)
            if not any_hit:
                # shadow casts never read u/v: skip their pick chains
                # and merges (drain op count IS this kernel's wall)
                sel_u = pick(jnp.where(is_best, u, 0.0))
                sel_v = pick(jnp.where(is_best, v, 0.0))
                acc_u = jnp.where(upd, bc(sel_u), acc_u)
                acc_v = jnp.where(upd, bc(sel_v), acc_v)

        out_t[:] = acc_t
        out_i[:] = acc_i
        if not any_hit:
            out_u[:] = acc_u
            out_v[:] = acc_v

    # ---- drain: wait the oldest DMA, intersect its block -------------------
    def drain(qhead):
        slot = qhead & (NBUF - 1)
        pltpu.make_async_copy(
            leafblocks.at[0], blocks.at[slot], sem.at[slot]
        ).wait()
        if STREAM_DIAG == "count":
            out_u[0:1, 0:128] = out_u[0:1, 0:128] + 1.0
        if STREAM_DIAG == "nodrain":
            return
        if STREAM_DRAIN == "v3":
            _drain_v3(slot)
            return
        if STREAM_DRAIN == "v2":
            _drain_v2(slot)
            return
        block = blocks[slot]                               # [16, cols]
        alive_f = alive_now().astype(jnp.float32)

        # STATIC unroll over subtiles: static slices replace the previous
        # per-subtile dynamic roll, and best-hit state accumulates in the
        # output refs under zero-carry pl.when blocks — the fori_loop +
        # vector-carrying lax.cond it replaces copied four [RAY_ROWS, 128]
        # carries through every subtile on both branches (the same lesson
        # the binary kernel's leaf_tests learned; see traverse_pallas2).
        for j in range(n_subtiles):
            tile = block[:, j * SUB_SLOTS:(j + 1) * SUB_SLOTS].T  # [8, 16]

            def col(k, tile=tile):
                return jnp.broadcast_to(tile[:, k:k + 1], (SUBLANES, LANES))

            has_tri = jnp.max(tile[:, 9]) >= 0.0

            # sub-leaf AABB prefilter: a subtile is ONE SAH leaf, so its
            # box is a single AABB (every slot column repeats it — col(k)
            # is a sublane-uniform [8, 128] tile).  Slab-test the packet
            # in [8, 128]-row halves against those uniform tiles: one op
            # covers 8 ray rows.
            bt_now = out_t[:]
            bmnx, bmny, bmnz = col(10), col(11), col(12)
            bmxx, bmxy, bmxz = col(13), col(14), col(15)
            halves = []
            for h in range(RAY_ROWS // SUBLANES):
                sl = slice(h * SUBLANES, (h + 1) * SUBLANES)
                t0x = (bmnx - o_x[sl]) * invx[sl]
                t1x = (bmxx - o_x[sl]) * invx[sl]
                t0y = (bmny - o_y[sl]) * invy[sl]
                t1y = (bmxy - o_y[sl]) * invy[sl]
                t0z = (bmnz - o_z[sl]) * invz[sl]
                t1z = (bmxz - o_z[sl]) * invz[sl]
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
                )
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bt_now[sl]),
                )
                halves.append((tmin <= tmax) & (alive_f[sl] > 0.0))
            any_box = halves[0]
            for h in range(1, len(halves)):
                any_box = any_box | halves[h]
            go = jnp.any(any_box) & has_tri
            if STREAM_DIAG == "nomt":
                continue

            @pl.when(go)
            def _(col=col, halves=halves):
                tri_f = col(9)
                v0x, v0y, v0z = col(0), col(1), col(2)
                e1x, e1y, e1z = col(3), col(4), col(5)
                e2x, e2y, e2z = col(6), col(7), col(8)
                for g in range(RAY_ROWS):
                    row = lambda a: jnp.broadcast_to(a[g:g + 1, :],
                                                     (SUBLANES, LANES))
                    rox, roy, roz = row(o_x), row(o_y), row(o_z)
                    rdx, rdy, rdz = row(d_x), row(d_y), row(d_z)
                    mask_g = halves[g // SUBLANES][
                        g % SUBLANES:g % SUBLANES + 1, :]
                    rbt_row = out_t[g:g + 1, :]            # [1, 128]
                    rbt = jnp.broadcast_to(rbt_row, (SUBLANES, LANES))

                    hx = rdy * e2z - rdz * e2y
                    hy = rdz * e2x - rdx * e2z
                    hz = rdx * e2y - rdy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / a
                    sx = rox - v0x
                    sy = roy - v0y
                    sz = roz - v0z
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (rdx * qx + rdy * qy + rdz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (
                        (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > DELTA) & (t < rbt) & mask_g & (tri_f >= 0.0)
                    )
                    t = jnp.where(ok, t, INF)
                    tmin = jnp.min(t, axis=0, keepdims=True)       # [1, 128]
                    found = tmin < rbt_row
                    is_best = (t == jnp.broadcast_to(tmin, t.shape)) & ok
                    pick = lambda val: jnp.max(
                        jnp.where(is_best, val, -jnp.float32(INF)),
                        axis=0, keepdims=True,
                    )
                    sel_i = pick(tri_f)
                    out_t[g:g + 1, :] = jnp.where(found, tmin, rbt_row)
                    out_i[g:g + 1, :] = jnp.where(
                        found, sel_i.astype(jnp.int32), out_i[g:g + 1, :])
                    if not any_hit:
                        # shadow casts never read u/v: skip their pick
                        # chains and the two serialized [1, 128] VMEM
                        # read-modify-writes per (group, subtile)
                        sel_u = pick(jnp.where(is_best, u, 0.0))
                        sel_v = pick(jnp.where(is_best, v, 0.0))
                        out_u[g:g + 1, :] = jnp.where(found, sel_u,
                                                      out_u[g:g + 1, :])
                        out_v[g:g + 1, :] = jnp.where(found, sel_v,
                                                      out_v[g:g + 1, :])

    # ---- node phase: pop SMEM nodes, DMA fat-leaf children -----------------
    def node_phase(carry):
        def cond(c):
            sp, qhead, qcount = c
            # leave room to enqueue both children of one pop
            return (sp > 0) & (qcount < NBUF - 1)

        def body(c):
            sp, qhead, qcount = c
            node = stack[sp - 1]
            sp = sp - 1
            bt = out_t[:]
            alive = alive_now()

            hit_a, tmin_a = box_test(node, 0, bt, alive)
            hit_b, tmin_b = box_test(node, 6, bt, alive)
            # true near-first ordering from the actual slab entry distances
            # (see traverse_pallas2._kernel)
            near_a = jnp.min(tmin_a)
            near_b = jnp.min(tmin_b)
            any_a = near_a < INF
            any_b = near_b < INF

            ca = childs[node * 2]
            cb = childs[node * 2 + 1]
            a_leaf = ca < 0
            b_leaf = cb < 0

            push_b = any_b & (~b_leaf)
            push_a = any_a & (~a_leaf)
            enq_a = any_a & a_leaf
            enq_b = any_b & b_leaf

            a_near = near_a <= near_b
            both = push_a & push_b
            first = jnp.where(a_near, cb, ca)
            second = jnp.where(a_near, ca, cb)

            @pl.when(both)
            def _():
                stack[sp] = first
                stack[sp + 1] = second

            @pl.when(push_b & ~both)
            def _():
                stack[sp] = cb

            @pl.when(push_a & ~both)
            def _():
                stack[sp] = ca

            sp = sp + push_a.astype(jnp.int32) + push_b.astype(jnp.int32)

            slot_a = (qhead + qcount) & (NBUF - 1)
            slot_b = (qhead + qcount + enq_a.astype(jnp.int32)) & (NBUF - 1)

            @pl.when(enq_a)
            def _():
                pltpu.make_async_copy(
                    leafblocks.at[-(ca + 1)], blocks.at[slot_a],
                    sem.at[slot_a],
                ).start()

            @pl.when(enq_b)
            def _():
                pltpu.make_async_copy(
                    leafblocks.at[-(cb + 1)], blocks.at[slot_b],
                    sem.at[slot_b],
                ).start()

            qcount = qcount + enq_a.astype(jnp.int32) + enq_b.astype(jnp.int32)
            return sp, qhead, qcount

        return jax.lax.while_loop(cond, body, carry)

    stack[0] = 0

    def outer_cond(c):
        sp, qhead, qcount = c
        return (sp > 0) | (qcount > 0)

    def outer_body(c):
        sp, qhead, qcount = node_phase(c)

        @pl.when(qcount > 0)
        def _():
            drain(qhead)

        qhead = jnp.where(qcount > 0, qhead + 1, qhead)
        qcount = jnp.maximum(qcount - 1, 0)
        return sp, qhead, qcount

    jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(1), jnp.int32(0), jnp.int32(0)),
    )


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "interpret", "any_hit"))
def _traverse_blocks(nodebox, childs, leafblocks, rays, n_blocks: int,
                     interpret: bool = False, any_hit: bool = False):
    plane = lambda: pl.BlockSpec(
        (RAY_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shape = (n_blocks * RAY_ROWS, LANES)
    out_shape = [
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
    ]
    return pl.pallas_call(
        _make_kernel(any_hit),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # fat-leaf blocks: HBM
        ] + [plane()] * 8,
        out_specs=[plane()] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((NBUF, BLOCK_ROWS, leafblocks.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(nodebox, childs, leafblocks,
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"], rays["tm"])


def intersect_stream(origin, direction, packed, active=None, sort=False,
                     t_max=None, interpret=False, any_hit=False):
    """Closest hit via the streaming kernel; same contract as
    intersect_bvh.  ``sort`` reorders rays by octant+Morton for packet
    coherence and scatters results back.  ``t_max`` caps the search
    (shadow-ray pruning); misses still report t = inf.  ``any_hit``
    licenses first-hit termination (see intersect_pallas2)."""
    if sort and "lo" in packed:
        key = _morton_key(origin, direction, packed["lo"], packed["hi"],
                          active=active)
        order = jnp.argsort(key)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        i, t, u, v = intersect_stream(
            origin[order], direction[order], packed,
            active=None if active is None else active[order], sort=False,
            t_max=None if t_max is None else t_max[order],
            interpret=interpret, any_hit=any_hit,
        )
        return i[inv], t[inv], u[inv], v[inv]

    n = origin.shape[0]
    n_pad = max(BLOCK_RAYS, ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS)
    n_blocks = n_pad // BLOCK_RAYS
    cap = MAX_BLOCKS_PER_CALL
    n_super = 1
    if n_blocks > cap:
        # bounded launches: pad the block count to a multiple of the cap
        # (dead rays, act = 0) and lax.map one sub-dispatch per super-chunk
        n_super = (n_blocks + cap - 1) // cap
        n_blocks = n_super * cap
        n_pad = n_blocks * BLOCK_RAYS

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * RAY_ROWS, LANES)

    act = (jnp.ones((n,), jnp.float32) if active is None
           else active.astype(jnp.float32))
    tm = jnp.full((n,), INF) if t_max is None else t_max
    rays = dict(
        ox=plane(origin[:, 0], 0.0), oy=plane(origin[:, 1], 0.0),
        oz=plane(origin[:, 2], 0.0),
        dx=plane(direction[:, 0], 1.0), dy=plane(direction[:, 1], 0.0),
        dz=plane(direction[:, 2], 0.0),
        act=plane(act, 0.0), tm=plane(tm, 0.0),
    )
    if n_super > 1:
        stacked = {k: v.reshape(n_super, cap * RAY_ROWS, LANES)
                   for k, v in rays.items()}
        outs = jax.lax.map(
            lambda r: _traverse_blocks(
                packed["nodebox"], packed["childs"], packed["leafblocks"],
                r, cap, interpret=interpret, any_hit=any_hit,
            ),
            stacked,
        )
        t, i, u, v = (o.reshape(n_blocks * RAY_ROWS, LANES) for o in outs)
    else:
        t, i, u, v = _traverse_blocks(
            packed["nodebox"], packed["childs"], packed["leafblocks"], rays,
            n_blocks, interpret=interpret, any_hit=any_hit,
        )
    reshape = lambda a: a.reshape(n_pad)[:n]
    i = reshape(i)
    t = jnp.where(i >= 0, reshape(t), INF)   # capped misses -> inf
    return i, t, reshape(u), reshape(v)


def pack_stream(bvh, soup, leaf=None, blocks_per_leaf=1):
    """FlatBVH -> streaming layout: SMEM top tree + HBM fat-leaf blocks.

    The tree is cut at the shallowest subtrees holding <= 16*blocks_per_leaf
    SAH leaves; each cut becomes one [16, 128*blocks_per_leaf] fat-leaf
    block (DMA'd whole).  Raising ``blocks_per_leaf`` halves the SMEM top
    tree each doubling — the knob scene.py turns to fit huge scenes under
    the SMEM budget.  ``leaf`` accepts precomputed (possibly id-remapped)
    leaf tables.
    """
    from ..bvh.build import leaf_tables

    if bvh.max_leaf_size > SUB_SLOTS:
        raise ValueError("pack_stream expects a tree built with leaves <= 8")
    is_leaf = bvh.leaf_id >= 0
    if is_leaf[0]:
        raise ValueError("streaming kernel requires an inner root")
    n_nodes = bvh.n_nodes
    max_subleaves = SUBTILES * blocks_per_leaf

    # leaves under each preorder subtree: subtree of fi spans [fi, miss[fi])
    cut_mask, leaves_under = _cut_mask(bvh, max_subleaves)
    cuts = np.nonzero(cut_mask)[0]                   # preorder fat-leaf order
    cut_of = np.full(n_nodes, -1, dtype=np.int64)    # node -> fat leaf id
    cut_of[cuts] = np.arange(len(cuts))

    # top tree: inner nodes above every cut, renumbered compactly
    under = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(under, cuts, 1)
    np.add.at(under, bvh.miss[cuts], -1)
    under = np.cumsum(under[:-1]) > 0                # includes cut roots
    top = np.nonzero(~is_leaf & ~under)[0]
    top_ord = np.full(n_nodes, -1, dtype=np.int64)
    top_ord[top] = np.arange(len(top))

    left = top + 1
    right = bvh.right_child[top].astype(np.int64)

    def encode(child):
        return np.where(
            cut_of[child] >= 0, -(cut_of[child] + 1), top_ord[child]
        )

    childs = np.stack(
        [encode(left), encode(right)], axis=1
    ).astype(np.int32).ravel()

    nodebox = np.zeros((len(top), 6), dtype=np.uint32)
    for a in range(3):
        nodebox[:, 0 + a] = _pack_minmax(bvh.node_mins[left][:, a],
                                         bvh.node_maxes[left][:, a])
        nodebox[:, 3 + a] = _pack_minmax(bvh.node_mins[right][:, a],
                                         bvh.node_maxes[right][:, a])
    nodebox = nodebox.view(np.int32)
    nodebox = nodebox.ravel()

    tables = leaf_tables(bvh, soup) if leaf is None else leaf

    # fat-leaf blocks [n_fat, 16 rows, 128*blocks_per_leaf slots], filled
    # with one vectorized scatter per attribute (a python loop over fat
    # leaves costs minutes at 1M+ triangles).
    n_fat = len(cuts)
    leaf_nodes = np.nonzero(is_leaf)[0]              # preorder leaf order
    # cut subtrees are disjoint, contiguous preorder ranges [c, miss[c])
    # that jointly cover every leaf -> the covering cut is the last cut
    # root at or before the leaf
    fat_ids = np.searchsorted(cuts, leaf_nodes, side="right") - 1
    if not ((fat_ids >= 0).all()
            and (leaf_nodes < bvh.miss[cuts[fat_ids]]).all()):
        raise AssertionError("leaf outside every cut subtree")
    # rank of each leaf within its fat leaf (leaf_nodes are preorder, and
    # each cut's leaves are contiguous in preorder)
    first_of_fat = np.full(n_fat, len(leaf_nodes), dtype=np.int64)
    np.minimum.at(first_of_fat, fat_ids, np.arange(len(leaf_nodes)))
    sub_idx = np.arange(len(leaf_nodes)) - first_of_fat[fat_ids]
    assert (sub_idx >= 0).all() and (sub_idx < max_subleaves).all()

    lids = bvh.leaf_id[leaf_nodes]
    grid = lambda: np.zeros((n_fat, max_subleaves, SUB_SLOTS), np.float32)

    def scatter(vals):                                # vals [L, 8]
        g = grid()
        g[fat_ids, sub_idx] = vals
        return g.reshape(n_fat, max_subleaves * SUB_SLOTS)

    cols = max_subleaves * SUB_SLOTS
    blocks = np.zeros((n_fat, BLOCK_ROWS, cols), dtype=np.float32)
    for a in range(3):
        blocks[:, 0 + a] = scatter(tables["v0"][lids][:, :, a])
        blocks[:, 3 + a] = scatter(tables["e1"][lids][:, :, a])
        blocks[:, 6 + a] = scatter(tables["e2"][lids][:, :, a])
        blocks[:, 10 + a] = scatter(
            np.repeat(bvh.node_mins[leaf_nodes][:, a:a + 1], SUB_SLOTS, 1))
        blocks[:, 13 + a] = scatter(
            np.repeat(bvh.node_maxes[leaf_nodes][:, a:a + 1], SUB_SLOTS, 1))
    tri9 = grid()
    tri9[:] = -1.0                                    # empty slots: tri = -1
    tri9[fat_ids, sub_idx] = tables["tri_index"][lids]
    blocks[:, 9] = tri9.reshape(n_fat, cols)

    return dict(
        nodebox=nodebox,
        childs=childs,
        leafblocks=blocks,
        lo=bvh.node_mins[0].astype(np.float32),
        hi=bvh.node_maxes[0].astype(np.float32),
    )


def _cut_mask(bvh, max_subleaves):
    """Vectorized subtree cut: a node is a fat-leaf root iff its subtree
    holds <= max_subleaves leaves and its parent's holds more."""
    n_nodes = bvh.n_nodes
    is_leaf = bvh.leaf_id >= 0
    leaf_prefix = np.concatenate([[0], np.cumsum(is_leaf)])
    leaves_under = leaf_prefix[bvh.miss] - leaf_prefix[np.arange(n_nodes)]
    if leaves_under[0] <= max_subleaves:
        raise ValueError("scene too small for the streaming kernel")
    inner = np.nonzero(~is_leaf)[0]
    parent = np.zeros(n_nodes, dtype=np.int64)       # root's stays 0
    parent[inner + 1] = inner
    parent[bvh.right_child[inner]] = inner
    cut_mask = (leaves_under <= max_subleaves) \
        & (leaves_under[parent] > max_subleaves)
    return cut_mask, leaves_under


def _pack_minmax(mins, maxes):
    """One uint32 per (min, max) pair: bf16(min) rounded toward -inf in
    the low half, bf16(max) rounded toward +inf in the high half.  The
    kernel reconstructs f32 with a shift/mask + bitcast; directed
    rounding keeps the slab test conservative (<= 0.4% box inflation —
    spurious visits only, never lost hits)."""
    def directed(v, toward_neg):
        b = np.ascontiguousarray(v.astype(np.float32)).view(np.uint32)
        trunc = b & np.uint32(0xFFFF0000)
        inexact = (b & np.uint32(0xFFFF)) != 0
        neg = (b & np.uint32(0x80000000)) != 0
        # f32 truncation rounds toward zero; bump one bf16 ulp outward
        # when inexact on the shrinking side
        bump = (inexact & (neg if toward_neg else ~neg)).astype(np.uint32)
        return trunc + (bump << 16)

    return (directed(mins, True) >> 16) | directed(maxes, False)


def smem_bytes_estimate(bvh, blocks_per_leaf=1) -> int:
    """Top-tree SMEM cost of pack_stream WITHOUT building the blocks —
    scene.py probes blocks_per_leaf with this before packing."""
    cut_mask, _ = _cut_mask(bvh, SUBTILES * blocks_per_leaf)
    cuts = np.nonzero(cut_mask)[0]
    under = np.zeros(bvh.n_nodes + 1, dtype=np.int64)
    np.add.at(under, cuts, 1)
    np.add.at(under, bvh.miss[cuts], -1)
    under = np.cumsum(under[:-1]) > 0
    n_top = int((~(bvh.leaf_id >= 0) & ~under).sum())
    return n_top * 8 * 4               # 6 packed box words + 2 child words


def smem_bytes(packed) -> int:
    return int(packed["nodebox"].size + packed["childs"].size) * 4


def hbm_bytes(packed) -> int:
    return int(packed["leafblocks"].size) * 4
