"""Pallas TPU 8-wide (BVH8) packet traversal.

Successor to the binary packet kernel (traverse_pallas2.py), built from
its measurements: a binary pop costs ~370 cycles of which ~40 are box
math — the serial SMEM-scalar-load -> broadcast -> reduce -> branch chain
dominates, so the wide kernel restructures the NODE FETCH and LEAF FETCH
around whole-tile vector loads:

  * The SAH binary tree is collapsed into 8-wide nodes (largest-surface-
    area child expanded first, the standard BVH8 recipe).  One pop now
    retires what took ~3-4 binary pops.
  * All 8 children's boxes load as ONE [48, 128] VMEM roll (row f*8+c =
    field f of child c, lane = wide-node id); the slab test runs per
    ray-group as [8 children x 128 rays] per vector op — the same
    transposed trick the leaf MT uses, with zero scalar loads.
  * Each wide node's leaf children live in ONE slot-aligned [8, 128]
    leaf block (slot c = child c), so the whole leaf phase of a node does
    a single aligned load — no per-leaf roll — and per-slot Möller-
    Trumbore runs under a pl.when only for hit slots.
  * Best-hit state (t, i, u, v — four [8, 128] tiles) rides in the
    while_loop CARRY, i.e. in vector registers, and the output refs are
    written once after the loop.  The previous formulation accumulated
    into the refs with four masked [1, 128] read-modify-writes per
    (leaf-child, ray-group) — the same serialized VMEM-RMW latency chain
    that cost the v1 streaming drain ~10x (see traverse_stream.py drain
    notes); with ~6 leaf visits per node and 8 groups each, those stalls
    dominated the dragon-scale leaf phase.

SMEM cost collapses to ~36 B per wide node (~0.6 B/triangle), so the
scene ceiling moves from SMEM to the VMEM leaf table (~64 B/triangle).

Replaces /root/reference/src/trace.metal:144-176 (per-thread stack walk)
for mid-size scenes; same contract as intersect_bvh.
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

SUBLANES = 8
LANES = 128
BLOCK_RAYS = SUBLANES * LANES  # 1024
STACK_DEPTH = 256              # only inner wide nodes are ever pushed
WIDE = 8                       # children per node
LEAF_COLS = 16                 # v0(3) e1(3) e2(3) tri(1) pad(6)
BOX_FIELDS = 6                 # minx miny minz maxx maxy maxz
BIG = 1e30                     # empty-child box sentinel (never hits):
                               # min = max = +BIG.  NOT the inverted box
                               # (min=+BIG, max=-BIG) — the kernel's slab
                               # test orders t0/t1 per axis (min/max),
                               # which un-inverts it into an always-hit;
                               # harmless when empty slots read the
                               # node's own inert tile (padded layout),
                               # but the compact roll would expose
                               # foreign leaves to those phantom hits.
INF = float("inf")

# COMPACT leaf layout: 12 pad-free slots of 10 columns per 128-lane page
# (lanes 120-127 unused) instead of 8 slots of 16 — 1.5x more leaves per
# VMEM byte before bin-packing gains.  The kernel still requires the
# node's leaf children at tile columns c*cols, so each node's page view
# is ROLLED left by its slot shift (lblocks encodes page*32 + shift).
# Safety invariant: a node's k leaf children occupy the contiguous slot
# run [shift, shift+k) with shift + k <= C_SLOTS, so post-roll the
# touched lanes are [0, k*10) while the 8 pad lanes land at
# 120 - shift*10 >= k*10 and the wrapped lanes at 128 - shift*10 — both
# strictly past the last touched lane for every legal (shift, k).
C_SLOTS = 12
C_LEAF_COLS = 10
C_SHIFT_MOD = 32               # lblocks = page * 32 + slot shift

import os

# max packets per pallas_call (per-launch watchdog; see
# traverse_stream.MAX_BLOCKS_PER_CALL for the measured failure)
MAX_BLOCKS_PER_CALL = int(os.environ.get("CLIVE2_PALLAS_MAX_BLOCKS", 2048))


def _make_kernel(any_hit: bool, group_gate: bool, compact: bool = False,
                 pop2: bool = False, bits: bool = False):
    """``any_hit`` compiles the shadow-ray variant (first-hit termination;
    see traverse_pallas2._make_kernel for the contract).  ``group_gate``
    wraps each ray-group's leaf MT in a lax.cond on a scalar any-reduce of
    that group's box-hit mask — skipping the ~35 vector ops for groups
    with no ray touching the leaf child.  Opt-in (CLIVE2_WIDE_GATE=1)
    pending a hardware A/B: with coherent packets only 1-3 of 8 groups
    typically hit a given child, but each cond adds a serial
    reduce->branch to the critical path (the binary kernel measured ~550
    cycles per serialized scalar window), so the sign of the win is
    scene-dependent.  ``compact`` selects the 12-slot pad-free leaf page
    layout (one extra dynamic lane roll per leaf-phase node).  ``pop2``
    retires TWO stack nodes per while iteration — both SMEM reads issue
    before either node's pushes, so the two box-phase scalar-window
    chains (8 nears + the best-ref sweep each, the bulk of the pop's
    serial cost — the binary kernel's QUAD-pop won 3x on the same
    structure) can overlap; the second visit is neutralized via its
    ``en`` gate when the stack holds one entry.  Opt-in
    (CLIVE2_WIDE_POP2) pending the hardware A/B: two in-flight visits
    double the live mask registers, so the sign depends on spill
    behavior.  ``bits`` replaces the box phase's per-child scalar
    readouts (8 ``jnp.min`` nears + the chained best-ref sweep — the
    measured bulk of the pop's serial cost; Mosaic does not overlap
    independent scalar/reduce chains) with ONE f32 readout that
    bit-packs the per-child hit mask and the nearest-inner-child tie
    mask, decoded with scalar integer ALU; stack pushes become
    branch-free (unconditional write + predicated pointer advance, the
    binary kernel's phase-3 trick).  With ``group_gate`` it also packs
    the 64 per-(child, group) leaf-gate predicates into three f32
    readouts computed once per leaf-phase node instead of a
    reduce->cond window per gated MT.  Opt-in (CLIVE2_WIDE_BITS)
    pending the hardware A/B."""
    return functools.partial(_kernel, any_hit, group_gate, compact, pop2,
                             bits)


FLAG_BASE = BOX_FIELDS * WIDE          # wideboxes rows 48-55: inner flags


def _kernel(any_hit, group_gate, compact, pop2, bits,
            wideboxes, childs, lblocks, leaff,
            ox, oy, oz, dx, dy, dz, act, tm,
            out_t, out_i, out_u, out_v, stack):
    tiny = jnp.float32(1e-30)

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < tiny,
                               jnp.where(d < 0, -tiny, tiny), d)

    invx, invy, invz = inv(dx[:]), inv(dy[:]), inv(dz[:])
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    active = act[:] > 0.0
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)

    out_t[:] = tm[:]
    out_i[:] = jnp.full((SUBLANES, LANES), -1, dtype=jnp.int32)
    out_u[:] = jnp.zeros((SUBLANES, LANES), dtype=jnp.float32)
    out_v[:] = jnp.zeros((SUBLANES, LANES), dtype=jnp.float32)

    def row(a, g):
        return jnp.broadcast_to(a[g:g + 1, :], (SUBLANES, LANES))

    def leaf_slot_mt(tile, masks_c, gbits=None):
        """MT of one 8-tri leaf tile against the whole packet.  The
        best-hit state reads the output refs ONCE ([8, 128] tiles), folds
        all 8 ray-groups in registers, and writes back ONCE — the
        previous per-group [1, 128] read-modify-writes serialized ~64
        VMEM round-trips per node on the leaf phase's critical path.
        tile: [8 tris, 16 attrs]; masks_c[g]: [1, 128] box-hit mask of
        this child for ray-group g."""
        bt, bi, bu, bv = out_t[:], out_i[:], out_u[:], out_v[:]

        def col(k):
            return jnp.broadcast_to(tile[:, k:k + 1], (SUBLANES, LANES))

        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        tri_f = col(9)

        for g in range(SUBLANES):
            def mt_group(bt, bi, bu, bv, g=g):
                rox, roy, roz = row(o_x, g), row(o_y, g), row(o_z, g)
                rdx, rdy, rdz = row(d_x, g), row(d_y, g), row(d_z, g)
                rhit = jnp.broadcast_to(masks_c[g], (SUBLANES, LANES))
                rbt_row = bt[g:g + 1, :]
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
                    & (t > DELTA) & (t < rbt) & rhit & (tri_f >= 0.0)
                )
                t = jnp.where(ok, t, INF)
                tmin = jnp.min(t, axis=0, keepdims=True)   # [1, 128]
                found = tmin < rbt_row
                is_best = (t == jnp.broadcast_to(tmin, t.shape)) & ok
                pick = lambda val: jnp.max(
                    jnp.where(is_best, val, -jnp.float32(INF)),
                    axis=0, keepdims=True
                )
                sel_i = pick(tri_f)
                upd = (rowsel == g) & jnp.broadcast_to(
                    found, (SUBLANES, LANES))
                bc = lambda r: jnp.broadcast_to(r, (SUBLANES, LANES))
                bt = jnp.where(upd, bc(tmin), bt)
                bi = jnp.where(upd, bc(sel_i.astype(jnp.int32)), bi)
                if not any_hit:
                    # shadow casts never read u/v: skip their pick
                    # chains and register merges (u/v stay zero)
                    sel_u = pick(jnp.where(is_best, u, 0.0))
                    sel_v = pick(jnp.where(is_best, v, 0.0))
                    bu = jnp.where(upd, bc(sel_u), bu)
                    bv = jnp.where(upd, bc(sel_v), bv)
                return bt, bi, bu, bv

            if group_gate:
                # bits mode: the predicate is a pre-decoded scalar (three
                # packed readouts per leaf-phase node) instead of a
                # vector reduce->scalar window per (child, group)
                pred = gbits[g] if gbits is not None else jnp.any(masks_c[g])
                bt, bi, bu, bv = jax.lax.cond(
                    pred, mt_group,
                    lambda bt, bi, bu, bv: (bt, bi, bu, bv),
                    bt, bi, bu, bv,
                )
            else:
                bt, bi, bu, bv = mt_group(bt, bi, bu, bv)
        out_t[:] = bt
        out_i[:] = bi
        out_u[:] = bu
        out_v[:] = bv

    stack[0] = 0

    def cond(sp):
        return sp > 0

    def visit(node, sp, en):
        bt = out_t[:]
        # any-hit: rays that already recorded an occluder leave the union
        alive = (active & (out_i[:] < 0)) if any_hit else active
        # en gates the whole visit (pop2's second slot when the stack had
        # a single entry): no ray alive -> no box hits -> no pushes, no
        # leaf work, sp unchanged
        alive = jnp.logical_and(alive, en)
        alive_f = alive.astype(jnp.float32)

        # ---- fetch all 8 children's boxes: one [48, 128] roll ------------
        grp = pl.multiple_of((node // LANES) * LANES, LANES)
        wide = wideboxes[:, pl.ds(grp, LANES)]             # [56, 128]
        colv = pltpu.roll(wide, shift=-(node % LANES), axis=1)[:, 0:1]

        def field(k):                                      # [8, 1] -> bcast
            return jnp.broadcast_to(colv[WIDE * k:WIDE * (k + 1)],
                                    (SUBLANES, LANES))

        bminx, bminy, bminz = field(0), field(1), field(2)
        bmaxx, bmaxy, bmaxz = field(3), field(4), field(5)

        # ---- slab test: [8 children x 128 rays] per ray-group ------------
        masks = []                                         # per g: [8, 128]
        tmin_red = None
        for g in range(SUBLANES):
            rivx, rivy, rivz = row(invx, g), row(invy, g), row(invz, g)
            rox, roy, roz = row(o_x, g), row(o_y, g), row(o_z, g)
            t0x = (bminx - rox) * rivx
            t1x = (bmaxx - rox) * rivx
            t0y = (bminy - roy) * rivy
            t1y = (bmaxy - roy) * rivy
            t0z = (bminz - roz) * rivz
            t1z = (bmaxz - roz) * rivz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), row(bt, g)),
            )
            hit = (tmin <= tmax) & (row(alive_f, g) > 0.0)
            masks.append(hit)
            tg = jnp.where(hit, tmin, INF)
            red = jnp.min(tg, axis=1, keepdims=True)       # [8, 1]
            tmin_red = red if tmin_red is None else jnp.minimum(tmin_red, red)

        refs = [childs[node * WIDE + c] for c in range(WIDE)]
        if bits:
            # ---- ONE scalar window for the whole pop decision ------------
            # Pack per-child hit (bits 0-7) and the nearest-INNER-child
            # tie mask (bits 8-15) into one f32 (exact: value < 2^16) and
            # read it out once; everything downstream is scalar ALU.
            # Inner-ness must be available in VECTOR registers for the
            # tie mask, hence the pack-time flag rows.
            inner_v = colv[FLAG_BASE:FLAG_BASE + WIDE] > 0.5   # [8, 1]
            hit_v = tmin_red < INF                             # [8, 1]
            inner_hit = hit_v & inner_v
            near_i = jnp.where(inner_hit, tmin_red, INF)
            bestnear = jnp.min(near_i, axis=0, keepdims=True)  # [1, 1]
            is_best = inner_hit & (near_i <= jnp.broadcast_to(
                bestnear, near_i.shape))
            # int iota then convert: Mosaic's tpu.iota only produces
            # integer vectors (a float iota passes interpret mode but
            # fails hardware verification — same class as the round-3
            # scalar-bitcast catch)
            pw = jnp.exp2(jax.lax.broadcasted_iota(
                jnp.int32, (WIDE, 1), 0).astype(jnp.float32))  # 2^c exact
            cmb = jnp.sum(jnp.where(hit_v, pw, 0.0)
                          + jnp.where(is_best, pw * 256.0, 0.0))
            ci = cmb.astype(jnp.int32)                         # < 2^16
            hit_c = [((ci // (1 << c)) % 2) == 1 for c in range(WIDE)]
            # first set tie bit = first child achieving the min (matches
            # the sweep's first-strictly-better semantics; ties are
            # common — two boxes containing the origin both clamp to 0)
            seen = jnp.int32(0)
            best_ref = jnp.int32(-1)
            isf = []
            for c in range(WIDE):
                bb = (ci // (1 << (8 + c))) % 2
                f_c = (bb == 1) & (seen == 0)
                seen = seen + bb
                isf.append(f_c)
                best_ref = jnp.where(f_c, refs[c], best_ref)
            # branch-free pushes (pallas2 phase-3): dead slots get a
            # stale-but-valid id (0 = root) so pop2's clamped read and
            # the stale-slot invariant stay safe; nearest inner last
            # (top of stack)
            for c in range(WIDE):
                push = hit_c[c] & (refs[c] >= 0) & jnp.logical_not(isf[c])
                stack[sp] = jnp.where(push, refs[c], 0)
                sp = sp + push.astype(jnp.int32)
            stack[sp] = jnp.where(best_ref >= 0, best_ref, 0)
            sp = sp + (best_ref >= 0).astype(jnp.int32)
        else:
            # per-child nearest entry distance -> 8 scalars (one sync
            # window each; Mosaic serializes them)
            nears = [jnp.min(tmin_red[c:c + 1, :]) for c in range(WIDE)]

            # ---- push hit inner children, nearest popped first -----------
            hit_c = [nears[c] < INF for c in range(WIDE)]
            best_near = INF
            best_ref = jnp.int32(-1)
            for c in range(WIDE):
                cand = hit_c[c] & (refs[c] >= 0)
                better = cand & (nears[c] < best_near)
                best_near = jnp.where(better, nears[c], best_near)
                best_ref = jnp.where(better, refs[c], best_ref)
            for c in range(WIDE):
                push = hit_c[c] & (refs[c] >= 0) & (refs[c] != best_ref)

                @pl.when(push)
                def _(ref=refs[c], sp=sp):
                    stack[sp] = ref

                sp = sp + push.astype(jnp.int32)

            @pl.when(best_ref >= 0)
            def _(sp=sp):
                stack[sp] = best_ref

            sp = sp + (best_ref >= 0).astype(jnp.int32)

        # ---- leaf phase: one aligned block, per-slot MT under pl.when ----
        lb = lblocks[node]
        leaf_any = jnp.bool_(False)
        for c in range(WIDE):
            leaf_any = leaf_any | (hit_c[c] & (refs[c] < 0))

        @pl.when((lb >= 0) & leaf_any)
        def _():
            if compact:
                pg = lb // C_SHIFT_MOD
                sh = lb - pg * C_SHIFT_MOD
                base = pl.multiple_of(pg * LANES, LANES)
                page = leaff[:, pl.ds(base, LANES)]        # [8, 128]
                # slot shift -> child alignment: child c's tile lands at
                # columns c*C_LEAF_COLS (wrap-free; see layout note)
                grpleaf = pltpu.roll(page, shift=-sh * C_LEAF_COLS, axis=1)
                cols = C_LEAF_COLS
            else:
                base = pl.multiple_of(lb * LANES, LANES)
                grpleaf = leaff[:, pl.ds(base, LANES)]     # [8, 128]
                cols = LEAF_COLS
            if bits and group_gate:
                # pack all 64 per-(child, group) gate predicates into
                # THREE f32 readouts (24/24/16 bits, each exact in f32
                # and < 2^24 so the int32 cast is safe) computed once
                # per leaf-phase node, replacing a vector-reduce window
                # per gated MT call
                pw2 = jnp.exp2(jax.lax.broadcasted_iota(
                    jnp.int32, (WIDE, 1), 0).astype(jnp.float32))
                gm = [jnp.any(masks[g], axis=1, keepdims=True)
                      for g in range(SUBLANES)]            # [8, 1] each
                words = []
                for w0 in range(0, SUBLANES, 3):
                    acc = jnp.zeros((WIDE, 1), jnp.float32)
                    for idx, g in enumerate(
                            range(w0, min(w0 + 3, SUBLANES))):
                        acc = acc + jnp.where(
                            gm[g], pw2 * float(256.0 ** idx), 0.0)
                    words.append(jnp.sum(acc).astype(jnp.int32))

                def gbit(g, c):
                    wi, idx = divmod(g, 3)
                    return ((words[wi] // (1 << (idx * 8 + c))) % 2) == 1
            for c in range(WIDE):
                @pl.when(hit_c[c] & (refs[c] < 0))
                def _(c=c):
                    tile = grpleaf[:, c * cols:(c + 1) * cols]
                    gb = ([gbit(g, c) for g in range(SUBLANES)]
                          if (bits and group_gate) else None)
                    leaf_slot_mt(tile, [m[c:c + 1, :] for m in masks], gb)

        return sp

    def body(sp):
        node_a = stack[sp - 1]
        if not pop2:
            return visit(node_a, sp - 1, jnp.bool_(True))
        # read BOTH nodes before either visit pushes over stack[sp-2];
        # the clamped read when sp == 1 lands on a stale-but-valid node
        # id and is neutralized by the en gate
        two = sp > 1
        node_b = stack[jnp.maximum(sp - 2, 0)]
        sp = sp - 1 - two.astype(jnp.int32)
        sp = visit(node_a, sp, jnp.bool_(True))
        return visit(node_b, sp, two)

    jax.lax.while_loop(cond, body, jnp.int32(1))


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "interpret", "any_hit",
                                    "group_gate", "compact", "pop2",
                                    "bits"))
def _traverse_blocks(wideboxes, childs, lblocks, leaff, rays,
                     n_blocks: int, interpret: bool = False,
                     any_hit: bool = False, group_gate: bool = False,
                     compact: bool = False, pop2: bool = False,
                     bits: bool = False):
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
        _make_kernel(any_hit, group_gate, compact, pop2, bits),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wideboxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # childs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lblocks
            pl.BlockSpec(memory_space=pltpu.VMEM),   # leaff
        ] + [plane()] * 8,
        out_specs=[plane()] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(wideboxes, childs, lblocks, leaff,
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"], rays["tm"])


def intersect_wide(origin, direction, packed, active=None, sort=False,
                   t_max=None, interpret=False, any_hit=False,
                   group_gate=None, pop2=None, bits=None):
    """Closest hit via the BVH8 kernel; same contract as intersect_bvh.
    ``any_hit`` licenses first-hit termination (see intersect_pallas2).
    ``group_gate`` (None -> CLIVE2_WIDE_GATE env, default off) skips the
    leaf MT for ray-groups whose box-hit mask is empty — see _make_kernel.
    ``bits`` (None -> CLIVE2_WIDE_BITS env / tuned wide_bits) selects the
    single-readout bit-packed box phase — see _make_kernel.
    The compact 12-slot leaf layout is selected by the ``packed`` dict
    itself (a ``compact`` marker entry written by pack_bvh8) — pytree
    structure, so the choice stays static under jit."""
    if group_gate is None or pop2 is None or bits is None:
        from ..utils.tuned import tuned_default

        if group_gate is None:
            group_gate = (os.environ.get("CLIVE2_WIDE_GATE")
                          or tuned_default("wide_gate", "0")) == "1"
        if pop2 is None:
            pop2 = (os.environ.get("CLIVE2_WIDE_POP2")
                    or tuned_default("wide_pop2", "0")) == "1"
        if bits is None:
            bits = (os.environ.get("CLIVE2_WIDE_BITS")
                    or tuned_default("wide_bits", "0")) == "1"
    pop2 = bool(pop2)
    bits = bool(bits)
    compact = "compact" in packed
    if sort and "lo" in packed:
        key = _morton_key(origin, direction, packed["lo"], packed["hi"],
                          active=active)
        order = jnp.argsort(key)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        i, t, u, v = intersect_wide(
            origin[order], direction[order], packed,
            active=None if active is None else active[order], sort=False,
            t_max=None if t_max is None else t_max[order],
            interpret=interpret, any_hit=any_hit, group_gate=group_gate,
            pop2=pop2, bits=bits,
        )
        return i[inv], t[inv], u[inv], v[inv]

    n = origin.shape[0]
    n_pad = max(BLOCK_RAYS, ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS)
    n_blocks = n_pad // BLOCK_RAYS
    cap = MAX_BLOCKS_PER_CALL
    n_super = 1
    if n_blocks > cap:
        # bounded launches (watchdog): pad to a cap multiple, map sub-calls
        n_super = (n_blocks + cap - 1) // cap
        n_blocks = n_super * cap
        n_pad = n_blocks * BLOCK_RAYS

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * SUBLANES, LANES)

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
        stacked = {k: v.reshape(n_super, cap * SUBLANES, LANES)
                   for k, v in rays.items()}
        outs = jax.lax.map(
            lambda r: _traverse_blocks(
                packed["wideboxes"], packed["childs"], packed["lblocks"],
                packed["leaff"], r, cap, interpret=interpret,
                any_hit=any_hit, group_gate=group_gate, compact=compact,
                pop2=pop2, bits=bits,
            ),
            stacked,
        )
        t, i, u, v = (o.reshape(n_blocks * SUBLANES, LANES) for o in outs)
    else:
        t, i, u, v = _traverse_blocks(
            packed["wideboxes"], packed["childs"], packed["lblocks"],
            packed["leaff"], rays, n_blocks, interpret=interpret,
            any_hit=any_hit, group_gate=group_gate, compact=compact,
            pop2=pop2, bits=bits,
        )
    reshape = lambda a: a.reshape(n_pad)[:n]
    i = reshape(i)
    t = jnp.where(i >= 0, reshape(t), INF)   # capped misses -> inf
    return i, t, reshape(u), reshape(v)


def collapse_bvh8(bvh):
    """Collapse the binary FlatBVH into 8-wide nodes.

    Per wide node: start with the binary root's two children; repeatedly
    expand the INNER candidate with the largest surface area until 8
    children or none expandable (the standard BVH8 collapse).  Children
    are binary node ids; inner ones become wide nodes recursively.

    Returns (wide_children, n_wide): list of per-wide-node child lists in
    wide-id order (DFS preorder); each child entry is a binary node id.
    """
    is_leaf = bvh.leaf_id >= 0
    if is_leaf[0]:
        raise ValueError("BVH8 collapse requires an inner root")
    ext = bvh.node_maxes - bvh.node_mins
    area = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
            + ext[:, 0] * ext[:, 2])

    def children_of(b):
        return [b + 1, int(bvh.right_child[b])]

    wide_children = []
    todo = [0]                       # binary roots of wide nodes, DFS
    wide_of = {}                     # binary root -> wide id
    while todo:
        root = todo.pop()
        wide_id = len(wide_children)
        wide_of[root] = wide_id
        slots = children_of(root)
        while len(slots) < WIDE:
            # expand the largest-area inner child
            cand, cand_a = -1, -1.0
            for k, b in enumerate(slots):
                if not is_leaf[b] and area[b] > cand_a:
                    cand, cand_a = k, float(area[b])
            if cand < 0:
                break
            b = slots.pop(cand)
            slots.extend(children_of(b))
        wide_children.append(slots)
        # queue inner children (reversed so DFS preorder matches pop order)
        for b in reversed(slots):
            if not is_leaf[b]:
                todo.append(b)
    return wide_children, wide_of


def pack_bvh8(bvh, soup, leaf=None, compact=False):
    """FlatBVH -> BVH8 layout (see module docstring for the shapes).

    Leaf pages are SLOT-PACKED: a 128-lane page holds 8 slots of
    LEAF_COLS columns (``compact=True``: 12 pad-free slots of
    C_LEAF_COLS), and several wide nodes SHARE one page (first-fit-
    decreasing bin packing of each node's leaf-child count).  In the
    default layout the kernel requires slot index == child index, so
    instead of telling the kernel where a node's slots start, the node's
    CHILDREN ARE REORDERED at pack time: its leaf children are assigned
    child indices equal to the page slots they received, and inner
    children fill the remaining indices.  Child order within a wide node
    is semantically free (the kernel's nearest-first pop is
    order-independent), so this costs nothing and shrinks the VMEM leaf
    table ~2.5-2.8x (measured 37-43% slot occupancy on dragon-scale
    scenes with one page per node), moving the wide kernel's scene
    ceiling from ~45k to ~100k triangles.

    ``compact=True`` drops the 6 pad columns per slot: leaf children take
    child indices 0..k-1, their slots are a contiguous run [s0, s0+k) in
    a 12-slot page, and ``lblocks`` encodes page*C_SHIFT_MOD + s0 so the
    kernel can roll the page into child alignment.  The run always fits
    wrap-free (s0 + k <= C_SLOTS = 12, and 12*C_LEAF_COLS = 120 <= 128);
    VMEM shrinks a further 1.5x+ (ceiling ~100k -> ~150k triangles) for
    one extra dynamic lane roll per leaf-phase node.
    """
    from ..bvh.build import leaf_tables

    slots_page = C_SLOTS if compact else WIDE
    cols = C_LEAF_COLS if compact else LEAF_COLS

    wide_children, wide_of = collapse_bvh8(bvh)
    n_wide = len(wide_children)
    is_leaf = bvh.leaf_id >= 0

    # pack-time stack bound (mirrors traverse_pallas2's check): a visit
    # pushes at most WIDE children and pop2 interleaves two frontiers
    maxd, dstack = 1, [(0, 1)]
    while dstack:
        w, dep = dstack.pop()
        maxd = max(maxd, dep)
        for b in wide_children[w]:
            if not is_leaf[b]:
                dstack.append((wide_of[b], dep + 1))
    if maxd * WIDE + 2 * WIDE > STACK_DEPTH:
        raise ValueError(
            f"BVH8 depth {maxd} may overflow the traversal stack "
            f"({STACK_DEPTH}); rebuild with a shallower tree or raise "
            f"STACK_DEPTH")

    n_pad = ((n_wide + LANES - 1) // LANES) * LANES
    # rows 0-47: 6 box fields x 8 children.  Rows 48-55: per-child INNER
    # flag (1.0 = child is an inner wide node) — the bits box phase needs
    # inner-ness in VECTOR registers to build the best-inner-child tie
    # mask without per-child scalar readouts (the scalar side gets it for
    # free from `childs`, but by then the sync window is already paid).
    # +32 B/node (~17% of the box table, ~1-2% of a packed scene's VMEM).
    wideboxes = np.zeros((BOX_FIELDS * WIDE + WIDE, n_pad), dtype=np.float32)
    wideboxes[:BOX_FIELDS * WIDE] = BIG      # empty slots: min=max=+BIG
    childs = np.full((n_wide * WIDE,), -1, dtype=np.int32)
    lblocks = np.full((n_wide,), -1, dtype=np.int32)

    tables = leaf_tables(bvh, soup) if leaf is None else leaf

    # --- pass 1: split children, bin-pack leaf runs into shared pages ---
    split = []                               # per node: (leaf_ids, inner_bs)
    for slots in wide_children:
        lf = [int(bvh.leaf_id[b]) for b in slots if is_leaf[b]]
        inr = [b for b in slots if not is_leaf[b]]
        split.append((lf, inr))
    order = sorted(
        (w for w in range(n_wide) if split[w][0]),
        key=lambda w: -len(split[w][0]),
    )
    free_pages = {k: [] for k in range(1, slots_page + 1)}
    page_used = []                           # page id -> slots consumed
    start = {}                               # node -> (page, first slot)
    for w in order:
        k = len(split[w][0])
        pg = -1
        for free in range(k, slots_page + 1):  # tightest fit first
            if free_pages[free]:
                pg = free_pages[free].pop()
                break
        if pg < 0:
            pg = len(page_used)
            page_used.append(0)
        start[w] = (pg, page_used[pg])
        page_used[pg] += k
        left = slots_page - page_used[pg]
        if left > 0:
            free_pages[left].append(pg)

    # --- pass 2: emit boxes/childs with leaf children at their slots ---
    blocks = [[-1] * slots_page for _ in page_used]  # page -> slot -> leaf
    for w in range(n_wide):
        lf, inr = split[w]
        if lf:
            pg, s0 = start[w]
            lblocks[w] = pg * C_SHIFT_MOD + s0 if compact else pg
        b_of_leaf = {int(bvh.leaf_id[b]): b for b in wide_children[w]
                     if is_leaf[b]}
        if compact:
            # leaf children take child indices 0..k-1; page slot = s0 + c
            leaf_cs = list(range(len(lf)))
            slot_of = {c: s0 + c for c in leaf_cs}
        else:
            leaf_cs = list(range(s0, s0 + len(lf))) if lf else []
            slot_of = {c: c for c in leaf_cs}
        inner_cs = [c for c in range(WIDE) if c not in leaf_cs]
        placed = (
            [(c, b_of_leaf[lid], lid) for c, lid in zip(leaf_cs, lf)]
            + [(c, b, -1) for c, b in zip(inner_cs, inr)]
        )
        for c, b, lid in placed:
            for f in range(BOX_FIELDS):
                src = bvh.node_mins if f < 3 else bvh.node_maxes
                wideboxes[f * WIDE + c, w] = src[b][f % 3]
            if lid >= 0:
                blocks[pg][slot_of[c]] = lid
            else:
                childs[w * WIDE + c] = wide_of[b]
                wideboxes[BOX_FIELDS * WIDE + c, w] = 1.0

    n_blocks_leaf = max(len(blocks), 1)
    leaff = np.zeros((SUBLANES, n_blocks_leaf * LANES), dtype=np.float32)
    for s in range(slots_page):              # default: inert slots
        leaff[:, s * cols + 9::LANES] = -1.0
    lv0, le1, le2 = tables["v0"], tables["e1"], tables["e2"]
    ltri = tables["tri_index"].astype(np.float32)
    for bi, blk in enumerate(blocks):
        for s, lid in enumerate(blk):
            if lid < 0:
                continue
            base = bi * LANES + s * cols
            leaff[:, base + 0:base + 3] = lv0[lid]
            leaff[:, base + 3:base + 6] = le1[lid]
            leaff[:, base + 6:base + 9] = le2[lid]
            leaff[:, base + 9] = ltri[lid]

    out = dict(
        wideboxes=wideboxes,
        childs=childs,
        lblocks=lblocks,
        leaff=leaff,
        lo=bvh.node_mins[0].astype(np.float32),
        hi=bvh.node_maxes[0].astype(np.float32),
    )
    if compact:
        out["compact"] = np.int32(1)         # pytree marker, see
    return out                               # intersect_wide


def smem_bytes(packed) -> int:
    return int(packed["childs"].size + packed["lblocks"].size) * 4


def vmem_bytes(packed) -> int:
    return int(packed["wideboxes"].size + packed["leaff"].size) * 4
