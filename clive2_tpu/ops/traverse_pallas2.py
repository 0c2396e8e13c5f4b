"""Pallas TPU packet BVH traversal.

Design evolved by measurement (a first version kept whole node records in
VMEM and spent ~700 cycles per node visit on dynamic-index scalar loads
and loop overhead).  Current design:

  * Node records live in SMEM (scalar memory — built for exactly this
    access pattern).  A record holds BOTH children's AABBs, so one pop
    tests two boxes and the stack only ever holds inner nodes: half the
    iterations, and leaf children are processed inline.
  * Leaf intersection is TRANSPOSED: the 8 padded leaf triangles load as
    one [8, 16] VMEM tile whose columns broadcast along lanes, and the
    1024-ray packet is processed as 8 groups of 128 rays broadcast along
    sublanes — every Möller-Trumbore op tests 8 triangles x 128 rays with
    zero scalar loads.

Node encoding (pack_bvh2): inner nodes renumbered compactly; a child
reference >= 0 is an inner id, < 0 encodes leaf id -(x+1).

SMEM capacity bounds the tree (~12 KB/1k inner nodes); scene.py checks
the budget and falls back to the gather walk for oversized scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DELTA

import os

SUBLANES = 8
LANES = 128


def _tuned(key, default):
    from ..utils.tuned import tuned_default

    return tuned_default(key, default)


# ray rows per packet (packet = RAY_ROWS * 128 rays).  The while-loop
# iteration cost is dominated by the serial scalar/reduce latency chain,
# NOT vector throughput — so taller packets amortize that fixed latency
# over more rays as long as the union divergence stays acceptable.
# Default 16 since the round-5 hardware A/B: with the gated ("rows")
# leaf phase, r16 beat r8 in BOTH microbench regimes (12.17/1.11 vs
# 10.52/0.89 Mrays/s at 47k) and in production (dragon 4.11 vs 3.75,
# teapots 8.60 vs 7.67 — docs/bench_r05_ab.log); r32/r64 lose the
# gains back to union divergence.  (The round-4 r16/r32 LOSS was
# measured under the all-rows leaf phase, where taller packets
# multiply dead leaf work — the gating is what flips the sign.)
RAY_ROWS = int(os.environ.get("CLIVE2_PACKET_ROWS")
               or _tuned("pallas_rows", "16"))
assert RAY_ROWS % 8 == 0, "CLIVE2_PACKET_ROWS must be a multiple of 8 " \
    "(packets are [8,128]-tile multiples)"
BLOCK_RAYS = RAY_ROWS * LANES
STACK_DEPTH = 384  # quad-pop pushes up to 8 entries per iteration
MAX_LEAF = 8
LEAF_COLS = 16  # v0(3) e1(3) e2(3) tri(1) pad(6)
INF = float("inf")

# stack entries popped per while-loop iteration (batched latency chains).
# Default 8 since the round-5 hardware A/B: with the gated leaf phase at
# r16 the walk is a larger share of the kernel, and QUAD=8 measured
# dragon-47k 4.37 vs 4.10 Mrays/s production (QUAD=16 flat at 4.32,
# r24 packets lose — docs/r5_chip_queue4/5.log)
QUAD = int(os.environ.get("CLIVE2_QUAD_POP")
           or _tuned("pallas_quad", "8"))

# measurement-only ablation (corrupts results; scripts/kernel_matrix.py):
#   "noleaf"  pop + box-test + stack walk only, leaf_tests skipped —
#             the node-vs-leaf cost split this kernel never had (the
#             round-4 profile says the 47k dragon is 97%
#             traversal-bound on this kernel but not WHERE inside it)
PALLAS_DIAG = os.environ.get("CLIVE2_PALLAS_DIAG", "")

# Leaf-phase execution policy.  "all" (the round-4 shipping behavior)
# runs the transposed MT for every ray row of the packet at every leaf
# visit — measured 67% of incoherent traversal time at 47k tris
# (docs/kernel_matrix_r05a.log: full 1118.6 ms vs noleaf 364.6 ms per
# 1M rays) because the packet UNION visits a leaf whenever any one row
# needs it.  "rows" gates the leaf MT per ray row: the leaf child's
# box-hit mask (already computed by the node phase) packs into 16-row
# bit words and only the set bits run — dead rows cost zero iterations
# (for_set_bits).  Gating per ROW, not per (group, visit) lax.cond,
# dodges the round-4 anti-pattern: the round-3 per-group gate paid a
# scalar branch on every group including dead ones.  Default "rows"
# since the round-5 production A/B (with r16 packets: dragon-47k 4.11
# vs 3.75, teapots 8.60 vs 7.67 Mrays/s, docs/bench_r05_ab.log).
PALLAS_LEAF = (os.environ.get("CLIVE2_PALLAS_LEAF")
               or _tuned("pallas_leaf", "rows"))

# max packets per pallas_call: one kernel launch must stay well under the
# TPU per-launch watchdog (see traverse_stream.MAX_BLOCKS_PER_CALL for the
# measured failure).  2048 packets = 2M rays ~ a few hundred ms here.
MAX_BLOCKS_PER_CALL = int(os.environ.get("CLIVE2_PALLAS_MAX_BLOCKS", 2048))


def bit_index16(b):
    """Index of the single set bit of a 16-bit one-hot word, in
    branch-free scalar ops (no reliance on Mosaic lowering clz/popcount
    on the scalar core)."""
    i = jnp.where((b & jnp.int32(0xFF00)) != 0, jnp.int32(8), jnp.int32(0))
    i = i | jnp.where((b & jnp.int32(0xF0F0)) != 0, 4, 0)
    i = i | jnp.where((b & jnp.int32(0xCCCC)) != 0, 2, 0)
    i = i | jnp.where((b & jnp.int32(0xAAAA)) != 0, 1, 0)
    return i


def for_set_bits(word0, base, visit):
    """Run ``visit(base + i)`` for every set bit i of ``word0`` (a 16-bit
    mask word).  Dead bits cost zero loop iterations — the shared
    skip-dead-work primitive of the streaming drain and the gated packet
    leaf phase."""
    def cond(w):
        return w != 0

    def body(w):
        b = w & (-w)
        visit(base + bit_index16(b))
        return w & (w - 1)

    jax.lax.while_loop(cond, body, word0)


def _make_kernel(any_hit: bool, leaf_mode: str):
    """Kernel factory.  ``any_hit`` compiles the shadow-ray variant: rays
    that have recorded ANY hit drop out of the box-test union, so packets
    over occluded connection segments terminate at the first occluder
    instead of refining to the closest one (the caller must cap ``t_max``
    strictly below the target so every recordable hit is a true occluder;
    see integrator/connect.py stage A).  ``leaf_mode`` selects the leaf
    phase: "all" rows or gated "rows" (see PALLAS_LEAF)."""
    return functools.partial(_kernel, any_hit, leaf_mode)


def _kernel(any_hit, leaf_mode, nodebox, childs, leaff,
            ox, oy, oz, dx, dy, dz, act, tm,
            out_t, out_i, out_u, out_v, stack, boxm):
    tiny = jnp.float32(1e-30)

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < tiny,
                               jnp.where(d < 0, -tiny, tiny), d)

    invx, invy, invz = inv(dx[:]), inv(dy[:]), inv(dz[:])
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    active = act[:] > 0.0
    # row-index plane + 16-row mask word count (gated leaf phase)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (RAY_ROWS, LANES), 0)
    ROWW = (RAY_ROWS + 15) // 16

    def box_test(node, base, bt, alive):
        """Returns (hit mask, per-ray entry distance; +inf where missed)."""
        off = node * 12 + base
        t0x = (nodebox[off + 0] - o_x) * invx
        t1x = (nodebox[off + 3] - o_x) * invx
        t0y = (nodebox[off + 1] - o_y) * invy
        t1y = (nodebox[off + 4] - o_y) * invy
        t0z = (nodebox[off + 2] - o_z) * invz
        t1z = (nodebox[off + 5] - o_z) * invz
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

    def leaf_tests(lid, box_hit):
        """Transposed MT: [8 tris x 128 rays] per vector op, accumulating
        the best hit IN the output refs (out_t/i/u/v double as the
        accumulators, like the streaming kernel) — so the traversal loop
        carries only the scalar stack pointer and leaf visits hang off
        zero-carry ``pl.when`` blocks instead of vector-carrying lax.cond.

        The leaf table is stored tri-major [8 slots, 16 * n_leaves]: one
        aligned [8, 128] load covers 8 leaves, a half-size roll brings the
        target leaf's 16 attribute columns to the front, and the [8, 16]
        tile is ready — no transpose (the previous attribute-major layout
        paid a [16, 128] roll plus a relayout transpose per visit)."""
        group = pl.multiple_of((lid // MAX_LEAF) * LANES, LANES)
        wide = leaff[:, pl.ds(group, LANES)]               # [8, 128]
        rolled = pltpu.roll(wide, shift=-(lid % MAX_LEAF) * LEAF_COLS, axis=1)
        tile = rolled[:, 0:LEAF_COLS]                      # [8, 16]

        def col(k):
            return jnp.broadcast_to(tile[:, k:k + 1], (SUBLANES, LANES))

        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        tri_f = col(9)

        def mt_row(g, rox, roy, roz, rdx, rdy, rdz, rhit, rbt_row):
            """Transposed MT for one ray row: 8 leaf triangles
            (sublanes) x 128 rays (lanes), best-hit folded into the
            output refs at row ``g`` (static OR traced — dynamic
            sublane indexing is Mosaic-legal)."""
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
            tmin = jnp.min(t, axis=0, keepdims=True)       # [1, 128]
            found = tmin < rbt_row
            is_best = (t == jnp.broadcast_to(tmin, t.shape)) & ok
            pick = lambda val: jnp.max(
                jnp.where(is_best, val, -jnp.float32(INF)),
                axis=0, keepdims=True
            )
            sel_i = pick(tri_f)
            out_t[pl.ds(g, 1), :] = jnp.where(found, tmin, rbt_row)
            out_i[pl.ds(g, 1), :] = jnp.where(
                found, sel_i.astype(jnp.int32), out_i[pl.ds(g, 1), :])
            if not any_hit:
                # shadow casts never read u/v — skipping the two pick
                # chains and, more importantly, the two serialized
                # [1, 128] VMEM read-modify-writes per (group, leaf
                # visit) (see traverse_wide's register-fold note for
                # what that RMW pattern costs)
                sel_u = pick(jnp.where(is_best, u, 0.0))
                sel_v = pick(jnp.where(is_best, v, 0.0))
                out_u[pl.ds(g, 1), :] = jnp.where(found, sel_u,
                                                  out_u[pl.ds(g, 1), :])
                out_v[pl.ds(g, 1), :] = jnp.where(found, sel_v,
                                                  out_v[pl.ds(g, 1), :])

        if leaf_mode == "rows":
            # gated: only ray rows whose box-hit mask is non-empty run
            # the MT — at tall packets the union visits a leaf for a
            # handful of rows, and the all-rows loop pays the full
            # RAY_ROWS everywhere (67% of incoherent traversal time at
            # 47k, docs/kernel_matrix_r05a.log).  The mask parks in
            # VMEM scratch so the traced row index can re-read it.
            boxm[:, :] = box_hit.astype(jnp.float32)

            def leaf_row(g):
                row = lambda ref: jnp.broadcast_to(
                    ref[pl.ds(g, 1), :], (SUBLANES, LANES))
                mt_row(g, row(ox), row(oy), row(oz),
                       row(dx), row(dy), row(dz),
                       row(boxm) > 0.0, out_t[pl.ds(g, 1), :])

            bit = jnp.where(box_hit, jnp.int32(1) << (rowi & 15),
                            jnp.int32(0))
            for w in range(ROWW):
                word = jnp.sum(
                    jnp.max(jnp.where((rowi >> 4) == w, bit, 0), axis=1))
                for_set_bits(word, w << 4, leaf_row)
        else:
            # all rows unconditionally: a per-GROUP lax.cond skip was
            # measured neutral-to-negative in round 3 (scalar branch
            # per group including dead ones) and it blocks overlap
            for g in range(RAY_ROWS):
                row = lambda a: jnp.broadcast_to(a[g:g + 1, :],
                                                 (SUBLANES, LANES))
                mt_row(g, row(o_x), row(o_y), row(o_z),
                       row(d_x), row(d_y), row(d_z),
                       row(box_hit.astype(jnp.float32)) > 0.0,
                       out_t[g:g + 1, :])

    stack[0] = 0
    # outputs double as best-hit accumulators; best-t starts at the
    # caller's per-ray cap (inf when uncapped): a shadow/visibility cast
    # seeds it with the segment length, pruning every subtree beyond the
    # target before the walk begins
    out_t[:] = tm[:]
    out_i[:] = jnp.full((RAY_ROWS, LANES), -1, dtype=jnp.int32)
    out_u[:] = jnp.zeros((RAY_ROWS, LANES), dtype=jnp.float32)
    out_v[:] = jnp.zeros((RAY_ROWS, LANES), dtype=jnp.float32)

    def cond(sp):
        return sp > 0

    # Pop up to QUAD stack entries per while-loop iteration.  A single-pop
    # loop is latency-bound, not throughput-bound: ~370 cycles/pop against
    # ~40 cycles of box-test math (SMEM load -> vector test -> cross-lane
    # reduction -> scalar branch is one long serial dependency chain).
    # Batching QUAD pops overlaps QUAD independent chains: all SMEM loads
    # issue together, all 2*QUAD box tests pipeline on the VPU, and all
    # 2*QUAD reductions share one sync window.  The loop carries ONLY the
    # scalar stack pointer — best-hit state lives in the output refs, so
    # leaf visits are zero-carry pl.when blocks (a vector-carrying
    # lax.cond pays register copies for all four [8, 128] carries on both
    # branches, every iteration).
    def body(sp):
        take = jnp.minimum(sp, QUAD)
        bt = out_t[:]
        # any-hit: rays that already recorded an occluder leave the union
        alive = (active & (out_i[:] < 0)) if any_hit else active

        # phase 1: pop + box-test (independent chains, no sync points)
        info = []
        for j in range(QUAD):
            node = stack[jnp.maximum(sp - 1 - j, 0)]
            ca = childs[node * 2]
            cb = childs[node * 2 + 1]
            hit_a, tmin_a = box_test(node, 0, bt, alive)
            hit_b, tmin_b = box_test(node, 6, bt, alive)
            info.append((ca, cb, hit_a, tmin_a, hit_b, tmin_b))
        sp = sp - take

        # phase 2: one reduction window; entries beyond `take` are voided
        # (stack slots below sp hold stale-but-valid node ids, so the
        # clamped loads above were safe to issue)
        nears = []
        for j, (ca, cb, hit_a, tmin_a, hit_b, tmin_b) in enumerate(info):
            valid_j = j < take
            na = jnp.where(valid_j, jnp.min(tmin_a), INF)
            nb = jnp.where(valid_j, jnp.min(tmin_b), INF)
            nears.append((na, nb))

        # phase 3: pushes — deepest-popped entry's children first so the
        # new top of stack is the top-popped node's nearest child.
        # BRANCH-FREE: stack slots at/above sp are dead (pops only read
        # below sp), so both candidate slots are written unconditionally
        # and only the pointer advance is predicated — no pl.when blocks.
        for j in range(QUAD - 1, -1, -1):
            ca, cb = info[j][0], info[j][1]
            na, nb = nears[j]
            push_a = (na < INF) & (ca >= 0)
            push_b = (nb < INF) & (cb >= 0)
            both = push_a & push_b
            a_near = na <= nb
            first = jnp.where(a_near, cb, ca)    # far pushed first
            second = jnp.where(a_near, ca, cb)   # near popped first

            stack[sp] = jnp.where(
                both, first, jnp.where(push_b, cb, ca)
            )
            stack[sp + 1] = second               # dead write unless `both`
            sp = sp + push_a.astype(jnp.int32) + push_b.astype(jnp.int32)

        # phase 4: leaf children — side-effecting, no carried vectors
        if PALLAS_DIAG != "noleaf":
            for j in range(QUAD):
                ca, cb, hit_a, tmin_a, hit_b, tmin_b = info[j]
                na, nb = nears[j]

                @pl.when((na < INF) & (ca < 0))
                def _(ca=ca, hit=hit_a):
                    leaf_tests(-(ca + 1), hit)

                @pl.when((nb < INF) & (cb < 0))
                def _(cb=cb, hit=hit_b):
                    leaf_tests(-(cb + 1), hit)

        return sp

    jax.lax.while_loop(cond, body, jnp.int32(1))


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "any_hit", "interpret",
                                    "leaf_mode"))
def _traverse_blocks(nodebox, childs, leaff, rays, n_blocks: int,
                     any_hit: bool = False, interpret: bool = False,
                     leaf_mode: str = "all"):
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
        _make_kernel(any_hit, leaf_mode),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [plane()] * 8,
        out_specs=[plane()] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            # leaf box-hit mask parking spot: the gated leaf phase's
            # traced row index must re-read per-row slices of the mask
            pltpu.VMEM((RAY_ROWS, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nodebox, childs, leaff,
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"], rays["tm"])


def _morton_key(origin, direction, lo, hi, active=None):
    """Packet-coherence sort key: 30-bit 3D Morton code of the ray's
    ENTRY POINT into the scene box (major), then 2 direction-octant bits
    (minor).  Sorting rays by this key before packetization tightens
    per-packet frustums; the host-side model (scripts/dma_model.py key
    A/B) confirms position-major beats octant-major 1.5-1.9x on
    incoherent fat-leaf visits.

    The entry point (origin advanced to the root-AABB boundary, or the
    origin itself when it already lies inside) is coherent for both ray
    regimes: camera rays share one origin but spread in direction — their
    entry points tile the box surface — while bounce rays have origins
    spread over scene surfaces, where entry == origin.  Keying on the raw
    origin (the previous scheme) collapses every camera packet into the
    same Morton cell, producing maximally divergent packets (measured 825
    of 4986 fat-leaf visits per packet on the 327k-tri dragon vs ~30 with
    entry-point keys).

    Inactive rays sort to the very end: the sort doubles as stream
    compaction — dead lanes collapse into all-dead packets whose shared
    stack empties after one root test."""
    octant = (
        (direction[:, 0] > 0).astype(jnp.uint32) * 4
        + (direction[:, 1] > 0).astype(jnp.uint32) * 2
        + (direction[:, 2] > 0).astype(jnp.uint32)
    )
    tiny = jnp.float32(1e-30)
    inv = 1.0 / jnp.where(
        jnp.abs(direction) < tiny,
        jnp.where(direction < 0, -tiny, tiny),
        direction,
    )
    t0 = (lo[None, :] - origin) * inv
    t1 = (hi[None, :] - origin) * inv
    t_enter = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    entry = origin + direction * jnp.nan_to_num(
        t_enter, posinf=0.0, neginf=0.0
    )[:, None]
    q = jnp.clip(
        ((entry - lo) / jnp.maximum(hi - lo, 1e-6) * 1024).astype(jnp.uint32),
        0, 1023,
    )

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    m = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    # position-major, octant-minor: bounce wavefronts (hemispherical
    # directions from clustered origins) packetize by locality, which
    # measured ~13% faster than octant-major on hemisphere rays over the
    # 327k-tri dragon; camera rays are insensitive (near-constant octant
    # within a tile)
    key = (m << 2) | (octant >> 1)
    if active is not None:
        key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
    return key


def intersect_pallas2(origin, direction, packed, active=None, sort=False,
                      t_max=None, any_hit=False, interpret=False,
                      leaf_mode=None):
    """Closest hit via the v2 packet kernel; same contract as
    intersect_bvh.  ``sort`` reorders rays by octant+Morton for packet
    coherence and scatters results back.  ``t_max`` ([N] f32, optional)
    caps the search — hits beyond it are ignored and the traversal prunes
    everything farther (shadow-ray optimization); misses still report
    t = inf.  ``any_hit`` licenses first-hit termination: the reported hit
    is SOME hit under t_max, not necessarily the closest (use for
    visibility casts whose t_max already excludes the target)."""
    if sort and "lo" in packed:
        key = _morton_key(origin, direction, packed["lo"], packed["hi"],
                          active=active)
        order = jnp.argsort(key)
        # inverse permutation via scatter (cheaper than a second argsort)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        i, t, u, v = intersect_pallas2(
            origin[order], direction[order], packed,
            active=None if active is None else active[order], sort=False,
            t_max=None if t_max is None else t_max[order], any_hit=any_hit,
            interpret=interpret, leaf_mode=leaf_mode,
        )
        return i[inv], t[inv], u[inv], v[inv]
    leaf_mode = PALLAS_LEAF if leaf_mode is None else leaf_mode

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
        return flat.reshape(n_blocks * RAY_ROWS, LANES)

    act = jnp.ones((n,), jnp.float32) if active is None else active.astype(jnp.float32)
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
                packed["nodebox"], packed["childs"], packed["leaff"], r, cap,
                any_hit=any_hit, interpret=interpret, leaf_mode=leaf_mode,
            ),
            stacked,
        )
        t, i, u, v = (o.reshape(n_blocks * RAY_ROWS, LANES) for o in outs)
    else:
        t, i, u, v = _traverse_blocks(
            packed["nodebox"], packed["childs"], packed["leaff"], rays,
            n_blocks, any_hit=any_hit, interpret=interpret,
            leaf_mode=leaf_mode,
        )
    reshape = lambda a: a.reshape(n_pad)[:n]
    i = reshape(i)
    t = jnp.where(i >= 0, reshape(t), INF)   # capped misses -> inf
    return i, t, reshape(u), reshape(v)


def pack_bvh2(bvh, soup, leaf=None):
    """FlatBVH -> v2 layout.  Requires the root to be an inner node (the
    scene build routes tiny scenes to the brute path first).  ``leaf``
    accepts precomputed (possibly id-remapped) leaf tables."""
    from ..bvh.build import leaf_tables

    is_leaf = bvh.leaf_id >= 0
    if is_leaf[0]:
        raise ValueError("v2 packet kernel requires an inner root")

    # SMEM stack safety: each quad-pop iteration pops <= QUAD entries and
    # pushes <= 2 per pop, so peak occupancy is bounded by
    # 2 * tree_depth + 2 * QUAD.  A pathologically deep SAH tree would
    # otherwise silently write past the scratch stack inside the kernel.
    inner_idx = np.nonzero(~is_leaf)[0]
    parent = np.zeros(bvh.n_nodes, dtype=np.int64)
    parent[inner_idx + 1] = inner_idx
    parent[bvh.right_child[inner_idx]] = inner_idx
    depth = np.zeros(bvh.n_nodes, dtype=np.int64)
    for i in range(1, bvh.n_nodes):          # preorder: parent precedes child
        depth[i] = depth[parent[i]] + 1
    max_depth = int(depth.max(initial=0))
    if 2 * max_depth + 2 * QUAD > STACK_DEPTH:
        raise ValueError(
            f"BVH depth {max_depth} exceeds the packet kernel's stack "
            f"bound (2*depth + 2*QUAD = {2 * max_depth + 2 * QUAD} > "
            f"{STACK_DEPTH}); rebuild with a shallower tree or raise "
            f"STACK_DEPTH"
        )

    inner = np.nonzero(~is_leaf)[0]
    inner_ord = np.full(bvh.n_nodes, -1, dtype=np.int64)
    inner_ord[inner] = np.arange(len(inner))

    left = inner + 1
    right = bvh.right_child[inner].astype(np.int64)

    def encode(child):
        lid = bvh.leaf_id[child]
        return np.where(lid >= 0, -(lid.astype(np.int64) + 1), inner_ord[child])

    childs = np.stack([encode(left), encode(right)], axis=1).astype(np.int32).ravel()

    nodebox = np.zeros((len(inner), 12), dtype=np.float32)
    nodebox[:, 0:3] = bvh.node_mins[left]
    nodebox[:, 3:6] = bvh.node_maxes[left]
    nodebox[:, 6:9] = bvh.node_mins[right]
    nodebox[:, 9:12] = bvh.node_maxes[right]
    nodebox = nodebox.ravel()  # SMEM pads 2D minor dims to 128 words

    tables = leaf_tables(bvh, soup) if leaf is None else leaf
    # tri-major layout [8 slots, 16 * n_leaves]: leaf l's [8, 16] tile
    # occupies lane columns [16l, 16l+16) — one aligned [8, 128] load
    # covers 8 leaves and a half-size roll fronts the target tile with no
    # transpose (see _kernel.leaf_tests)
    n_leaves = bvh.n_leaves
    attrs = np.zeros((n_leaves, MAX_LEAF, LEAF_COLS), dtype=np.float32)
    attrs[:, :, 0:3] = tables["v0"]
    attrs[:, :, 3:6] = tables["e1"]
    attrs[:, :, 6:9] = tables["e2"]
    attrs[:, :, 9] = tables["tri_index"].astype(np.float32)
    cols = n_leaves * LEAF_COLS
    cols_pad = ((cols + LANES - 1) // LANES) * LANES
    leafT = np.zeros((MAX_LEAF, cols_pad), dtype=np.float32)
    # [L, 8, 16] -> [8, L, 16] -> [8, L*16]
    leafT[:, :cols] = attrs.transpose(1, 0, 2).reshape(MAX_LEAF, cols)
    # padding columns: mark the tri-index attr as -1 so a rolled read of
    # the final partial group stays inert
    for c in range(cols + 9, cols_pad, LEAF_COLS):
        leafT[:, c] = -1.0
    leaff = leafT
    return dict(
        nodebox=nodebox,
        childs=childs,
        leaff=leaff,
        lo=bvh.node_mins[0].astype(np.float32),
        hi=bvh.node_maxes[0].astype(np.float32),
    )


def smem_bytes(packed) -> int:
    return int(packed["nodebox"].size + packed["childs"].size) * 4


def vmem_bytes(packed) -> int:
    """Actual VMEM footprint of the leaf table (tri-major layout has no
    lane-padding waste: 8 sublane-rows x 16*n_leaves lanes)."""
    rows, cols = packed["leaff"].shape
    padded_rows = ((rows + SUBLANES - 1) // SUBLANES) * SUBLANES
    padded_cols = ((cols + LANES - 1) // LANES) * LANES
    return padded_rows * padded_cols * 4
