"""Pallas TPU streaming traversal v2: MXU-bilinear Möller-Trumbore.

Successor to traverse_stream.py, built from its measured wall: the drain
(fat-leaf intersection) dominated at ~200-300 us per DMA'd block in every
VPU formulation tried —

  * transposed [8 tris x 128 rays] per-row MT: latency-bound on the serial
    [1, 128] reduce + read-modify-write chain per (subtile, row);
  * per-triangle VMEM-scalar broadcast: ~10 VMEM->SREG reads per triangle
    at ~150 cycles each;
  * rays-in-sublanes lane-column cross: single-lane extract broadcasts and
    per-group cross-lane reduces, both latency-heavy on the VPU.

The fix moves the ray x triangle cross products OFF the VPU entirely.
Möller-Trumbore's four intermediates are bilinear forms between a ray
feature vector and per-triangle feature vectors (validated to 1e-16
against the direct formulas):

    r   = [d, m, o, 1],  m = o x d        (the ray's Plücker moment)
    a   = r . [-n, 0, 0, 0]               n = e1 x e2
    u_n = r . [v0 x e2, e2, 0, 0]
    v_n = r . [-(v0 x e1), -e1, 0, 0]
    t_n = r . [0, 0, n, -v0.n]            u, v, t = (u_n, v_n, t_n) / a

so one transposed-lhs MXU matmul per ray chunk per fat-leaf block —
dot_general([K, 4*cols], [K, 128 rays], contracting dim 0 with dim 0)
-> [4*cols, 128] — performs 16,384+ ray-triangle tests' worth of
cross/dot products, followed by a dozen fully-pipelined elementwise
[128, 128] ops.  Both operands are K-MAJOR: the fat-leaf blocks are
stored [n_fat, K, 4*cols] so the per-leaf HBM DMA slice is
[K=64 sublanes, 4*128 lanes] — lane-dim 128-aligned, which Mosaic
REQUIRES (the round-3 tri-major [G*cols, K=64] layout put K in lanes
and died at hardware compile with "Slice shape along dimension 2 must
be aligned to tiling (128)"; 2026-08-20 probes: the transposed DMA and
the transposed-lhs dot both compile, scripts/probe_mosaic_layouts.py).
K-major also halves the ring slot's physical VMEM (a [*, 64]-lane
array is padded to 128 lanes; [64, 512] pads nothing).  The operands
carry a bf16x6 residual split stacked along K=64 (6 sections of
the 10 live feature columns + 4 zero pad; one padded MXU pass, ~f32
accuracy — see build_rayfeat for why plain bf16x3 let near-parallel
foreign triangles steal wins).  Best-hit state lives per
(ray, triangle-lane) in VMEM scratch — updates are pure elementwise
min/select with NO per-block reductions — and is folded to one winner
per ray ONCE per packet.  The kernel reports (t, fat-leaf slot code);
the XLA wrapper maps codes to triangle ids and re-runs the exact scalar
Möller-Trumbore on each ray's single winning triangle to recover u, v at
reference precision (ray origins and triangle bases are center-shifted
to keep the bilinear forms well-conditioned).

Top-tree walk (SMEM) and fat-leaf DMA ring are inherited unchanged from
traverse_stream.py.  Replaces /root/reference/src/trace.metal:144-176 for
scenes past the VMEM-resident kernels' ceiling; same contract as
intersect_bvh.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DELTA
from .traverse_pallas2 import _morton_key, for_set_bits
from ..utils.tuned import tuned_default
from .traverse_stream import (
    MAX_BLOCKS_PER_CALL,
    STACK_DEPTH,
    _cut_mask,
    _pack_minmax,
    smem_bytes_estimate,   # same 32 B/node packed top-tree layout
)

SUBLANES = 8
LANES = 128
# diagnostic ablations (scripts/diag_stream.py): "nodrain" waits each DMA
# then discards the block (node phase + DMA cost only); "count" adds one
# drain counter per packet in out_t row 0 (plus the normal drain work).
STREAM_DIAG = os.environ.get("CLIVE2_STREAM_DIAG", "")
# MXU precision for the drain matmul.  The operands are PRE-SPLIT into a
# 3-term bf16 residual decomposition stacked along K (bf16x6 — see
# build_rayfeat) and stored as NATIVE bf16, so ONE DEFAULT pass computes
# all six dominant cross products at ~f32 accuracy (the id channel is
# exact because its ray-side factor is the constant 1.0, and the
# winner's t/u/v are re-derived in exact f32 by the XLA wrapper).
# "highest" remains as an A/B knob (only meaningful for f32 operands).
STREAM_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("CLIVE2_STREAM_PREC", "default")]
# Diagnostic bisection knobs (all default off; compile-time only).
# They were built hunting the 2026-08-20 hardware mismatch and each
# EXONERATED its suspect — the real fault was OUTSIDE the kernel
# (XLA's excess-precision elision of build_rayfeat's residual split,
# see build_rayfeat).  Kept because they bisect a streaming kernel
# into its three risk layers in one session:
#   STAGE     copy the ring slot to a 2D scratch before the matmul
#             (isolates dynamically-indexed 3D operand lowering)
#   FULLDRAIN ignore chunk masks/spans, drain everything
#             (isolates write_masks / span logic)
#   SYNCDMA   wait each DMA at enqueue, no drain wait
#             (isolates async-DMA / semaphore interactions)
STREAM_STAGE = int(os.environ.get("CLIVE2_STREAM_STAGE", "0"))
STREAM_FULLDRAIN = int(os.environ.get("CLIVE2_STREAM_FULLDRAIN", "0"))
STREAM_SYNCDMA = int(os.environ.get("CLIVE2_STREAM_SYNCDMA", "0"))
# occlusion-driven culling (default on): each drained chunk refreshes a
# best-t PLANE (one sublane min-reduce + [1,128] row store), and the node
# phase's slab tests close intervals beyond each ray's current best —
# conservative-safe (a node entered at tmin > best cannot win) and
# exactly what the reference's per-thread `ray.t` early-out does
# (trace.metal:110, :152).  0 = static caps only (A/B knob).
STREAM_OCC = int(os.environ.get("CLIVE2_STREAM_OCC")
                 or tuned_default("stream2_occ", "1"))
# Dead-chunk skipping strategy inside the drain loop.  "span" (the
# round-4 shipping behavior) runs a fori_loop over the live row span
# [lo, hi] with a per-chunk mask-bit test — the round-4 host-exact
# accounting (scripts/drain_cost_model.py) measured 10.4M DEAD in-span
# chunks on the 200k incoherent workload, ~25% of total drain time,
# each paying only the mask read + branch.  "word" (round-5) iterates
# the SET BITS of each 16-bit mask word directly (b = word & -word;
# chunk = 16*w + bit_index(b); word &= word-1), so dead chunks cost
# zero iterations and the span bookkeeping (2 SMEM words + 2 vector
# reduces per enqueue) disappears.
STREAM_SKIP = (os.environ.get("CLIVE2_STREAM_SKIP")
               or tuned_default("stream2_skip", "word"))
assert STREAM_SKIP in ("span", "word"), \
    "CLIVE2_STREAM_SKIP must be span|word"
# ROWS / NBUF are stream2's OWN knobs (same env vars as the VPU stream
# kernel, but tuned defaults diverge: stream1's measured optima are
# ROWS=32 / NBUF=4 while the DMA model predicts ROWS=48 and a deeper
# ring for the MXU drain — tune_from_session writes the stream2_* keys
# from whichever knob-sweep section wins on hardware).
RAY_ROWS = int(os.environ.get("CLIVE2_STREAM_ROWS")
               or tuned_default("stream2_rows", "32"))
NBUF = int(os.environ.get("CLIVE2_STREAM_NBUF")
           or tuned_default("stream2_nbuf", "4"))
assert NBUF >= 2 and (NBUF & (NBUF - 1)) == 0, \
    "CLIVE2_STREAM_NBUF must be a power of two >= 2"
assert RAY_ROWS % SUBLANES == 0
BLOCK_RAYS = RAY_ROWS * LANES          # rays per packet
NCHUNK = BLOCK_RAYS // LANES           # 128-ray matmul chunks per packet
NMASKW = (NCHUNK + 15) // 16           # 16-bit chunk-mask words per slot
# Best-hit accumulator layout.  "full" (round-4 shipping) keeps per
# (tri-slot-row, ray-lane) state [NCHUNK, cols, 128] and folds once per
# packet — elementwise merges, but every live chunk-visit reads+writes
# 4x [cols, 128] f32 of VMEM.  "row" reduces each drain product to one
# [1, 128] best row immediately (sublane min + is-best max) so the
# accumulator is [NCHUNK, 128] x2 — 256x less accumulator traffic per
# visit and ~4 MB of VMEM scratch freed (headroom for deeper
# rings/taller packets), at the cost of two cross-sublane reduces per
# visit.  A/B knob; tuned key stream2_acc.
STREAM_ACC = (os.environ.get("CLIVE2_STREAM_ACC")
              or tuned_default("stream2_acc", "full"))
assert STREAM_ACC in ("full", "row"), "CLIVE2_STREAM_ACC must be full|row"
FEAT = 16                              # base ray/tri feature rows (10 used)
LIVE = 10                              # live feature columns per section
KDIM = 64                              # contracted dim: 6 bf16x6 sections of
                                       # 10 LIVE columns (60) + 4 zero pad —
                                       # the dead 6 columns per 16-wide
                                       # section were pure DMA waste (33% of
                                       # the fat-leaf bytes; the analytic
                                       # model in scripts/dma_model.py shows
                                       # incoherent wavefronts on 1M-tri
                                       # scenes are HBM-BW-capped, so bytes
                                       # are throughput)
GROUPS = 4                             # a | u_num | v_num | t_num.  The
                                       # round-4 layout carried a 5th
                                       # "code" group (fat-block id x the
                                       # ray's constant-1 feature) through
                                       # the matmul; the id is a per-BLOCK
                                       # scalar, so it now rides an SMEM
                                       # side table written at enqueue
                                       # (qleaf) — 20% fewer fat-leaf DMA
                                       # bytes and 20% fewer MACs per
                                       # drain for free
SUB_SLOTS = 8                          # triangles per SAH leaf
INF = float("inf")


def _make_kernel(n_fat_cols: int, any_hit: bool = False, agg: int = 1):
    """``agg`` = ring slots drained per MXU pass (1, 2 or 4 — see
    drain_multi)."""
    assert agg in (1, 2, 4)
    return functools.partial(_kernel, n_fat_cols, any_hit, agg)


def _kernel(cols, any_hit, agg, nodebox, childs, leafblocks, rayfeat,
            ox, oy, oz, dx, dy, dz, tm,
            out_t, out_code,
            stack, qmask, qleaf, acc_t, acc_c, blocks, staged, btcur, sem):
    """cols = triangles per fat leaf (128 * blocks_per_leaf).

    Orientation: RAYS LIVE IN LANES THROUGHOUT.  The drain matmul is
    [4*cols tri-rows, K] @ [K, 128 rays] so its output, the per-chunk
    accumulators ([cols, 128]), the fold (a sublane min-reduce straight
    to a [1, 128] row), the output planes, and the ox..tm input planes
    (row c = chunk c's 128 rays) all share one layout — no transposed
    cap sidecar, no iota-select fold block, no XLA-side unscramble."""
    tiny = jnp.float32(1e-30)

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < tiny,
                               jnp.where(d < 0, -tiny, tiny), d)

    invx, invy, invz = inv(dx[:]), inv(dy[:]), inv(dz[:])
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    bt0 = tm[:]                         # per-ray caps (lane-major planes)

    # per-packet accumulator init: best-t starts at the caller's cap
    # (inactive rays carry -1 so nothing can ever beat it), code -1.
    # Chunk c's caps are row c of the tm plane.  Chunk loops are
    # lax.fori_loops, NOT Python-unrolled: at NCHUNK=32 an unrolled drain
    # multiplied the Mosaic program ~32x and pushed remote compiles to
    # ~8 minutes.
    if STREAM_ACC == "row":
        acc_t[:, :] = tm[:]
        acc_c[:, :] = jnp.full((NCHUNK, LANES), -1.0, dtype=jnp.float32)
    else:
        def init_chunk(c, _):
            tm_row = tm[pl.ds(c, 1), :]                      # [1, 128]
            acc_t[c] = jnp.broadcast_to(tm_row, (cols, LANES))
            acc_c[c] = jnp.full((cols, LANES), -1.0, dtype=jnp.float32)
            return 0

        jax.lax.fori_loop(0, NCHUNK, init_chunk, 0)
    btcur[:, :] = tm[:]
    # absolute slot codes are fat_id * cols + tri-slot-row; the row plane
    # is a compile-time iota shared by every drain
    srow = jax.lax.broadcasted_iota(
        jnp.int32, (cols, LANES), 0).astype(jnp.float32)

    def cap_plane():
        return btcur[:] if STREAM_OCC else bt0

    def unpack_box(node, base):
        """6 slab planes from 3 packed SMEM words (see _pack_minmax):
        min = bitcast(word << 16), max = bitcast(word & 0xffff0000)."""
        off = node * 6 + (base >> 1)
        w0, w1, w2 = nodebox[off + 0], nodebox[off + 1], nodebox[off + 2]
        # Mosaic's tpu.bitcast only accepts VECTOR operands (interpret
        # mode accepts scalars — caught by the round-3 hardware gate):
        # splat the packed SMEM word to one [1, LANES] lane row first;
        # the slab arithmetic below broadcasts it across RAY_ROWS anyway.
        bc = lambda w: jax.lax.bitcast_convert_type(
            jnp.full((1, LANES), w, dtype=jnp.int32), jnp.float32)
        return (bc(w0 << 16), bc(w1 << 16), bc(w2 << 16),
                bc(w0 & jnp.int32(-65536)), bc(w1 & jnp.int32(-65536)),
                bc(w2 & jnp.int32(-65536)))

    def box_test(node, base, alive_t):
        """Packet slab test: returns (nearest entry t over the packet —
        INF when no ray hits — and the per-ray live mask).  ONE slab
        evaluation serves both the traversal decision and, when the
        child is a fat leaf, the drain chunk masks (write_masks used to
        recompute the identical 6-plane test per enqueue — pure waste,
        ~half the node phase's vector work on leaf-heavy walks)."""
        mnx, mny, mnz, mxx, mxy, mxz = unpack_box(node, base)
        t0x = (mnx - o_x) * invx
        t1x = (mxx - o_x) * invx
        t0y = (mny - o_y) * invy
        t1y = (mxy - o_y) * invy
        t0z = (mnz - o_z) * invz
        t1z = (mxz - o_z) * invz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), alive_t),
        )
        hit = tmin <= tmax
        return jnp.min(jnp.where(hit, tmin, INF)), hit

    # chunk c of the drain covers exactly plane row c (NCHUNK == RAY_ROWS),
    # so a per-ROW any-hit bitmask computed at enqueue time tells the drain
    # which chunks can possibly intersect the block.  The mask packs 16
    # rows per SMEM int32 word via a max-per-row / sum-over-rows reduce,
    # and the live ROW SPAN [lo, hi] rides in two more words so the drain
    # loop runs hi-lo+1 iterations instead of NCHUNK: Morton-sorted rays
    # cluster each fat leaf's needy rays into ~1-3 adjacent chunks, and
    # the fixed NCHUNK-iteration mask scan was a measured ~20% of the
    # incoherent-wavefront drain cost (and would grow linearly with the
    # packet size, defeating big packets).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (RAY_ROWS, LANES), 0)

    def write_masks(live, slot):
        """Pack the per-ray live mask (from the enqueue's OWN slab test,
        see box_test) into per-row chunk bits; under span mode also
        record the live row span [lo, hi] (word mode iterates set bits
        directly and needs no span)."""
        bit = jnp.where(live, jnp.int32(1) << (rowi & 15), jnp.int32(0))
        for w in range(NMASKW):
            qmask[slot, w] = jnp.sum(
                jnp.max(jnp.where((rowi >> 4) == w, bit, 0), axis=1))
        if STREAM_SKIP != "word" or STREAM_FULLDRAIN:
            qmask[slot, NMASKW] = jnp.min(
                jnp.where(live, rowi, jnp.int32(NCHUNK)))
            qmask[slot, NMASKW + 1] = jnp.max(
                jnp.where(live, rowi, jnp.int32(-1)))

    # word-granular set-bit iteration: dead chunks cost zero loop
    # iterations — the round-4 span scan paid a mask read + branch for
    # each of 10.4M dead in-span chunks on the incoherent workload
    # (scripts/drain_cost_model.py).  Shared with the packet kernel's
    # gated leaf phase.
    _for_set_bits = for_set_bits

    # ---- drain: one matmul + window + merge per live ray chunk -------------
    def _window(prod, off, cur_t):
        """Möller-Trumbore acceptance from one block's 4 product groups
        (rows [off, off+4*cols)): returns (ok, t).  The barycentric
        window uses the min form — min(u, v, 1-u-v) >= 0 is equivalent
        to the four separate comparisons (u <= 1 is implied by v >= 0
        and u+v <= 1) in 3 fewer [cols, 128] ops, and NaN from empty
        slots (a = 0) propagates through min to a False compare."""
        a = prod[off + 0 * cols:off + 1 * cols, :]
        u_n = prod[off + 1 * cols:off + 2 * cols, :]
        v_n = prod[off + 2 * cols:off + 3 * cols, :]
        t_n = prod[off + 3 * cols:off + 4 * cols, :]
        f = 1.0 / a
        u = u_n * f
        v = v_n * f
        t = t_n * f
        m = jnp.minimum(u, jnp.minimum(v, 1.0 - u - v))
        ok = (m >= 0.0) & (t > DELTA) & (t < cur_t)
        return ok, t

    def _merge_hits(prod, off, fat_id, cur_t, cur_c):
        """Elementwise (full-acc) merge into per-(tri-slot-row, ray-lane)
        best state; codes are absolute (fat_id * cols + row)."""
        ok, t = _window(prod, off, cur_t)
        code = fat_id.astype(jnp.float32) * float(cols) + srow
        return jnp.where(ok, t, cur_t), jnp.where(ok, code, cur_c)

    def _merge_row(prod, off, fat_id, c):
        """Row-acc merge: reduce this block's candidates for chunk ``c``
        to one [1, 128] best row and fold it into acc rows — the
        accumulator traffic drops from 4x [cols, 128] to [1, 128]s."""
        cur_row = acc_t[pl.ds(c, 1), :]                      # [1, 128]
        cur = jnp.broadcast_to(cur_row, (cols, LANES))
        ok, t = _window(prod, off, cur)
        tsel = jnp.where(ok, t, INF)
        t_red = jnp.min(tsel, axis=0, keepdims=True)         # [1, 128]
        found = t_red < cur_row
        is_best = (tsel == jnp.broadcast_to(t_red, tsel.shape)) & ok
        code = fat_id.astype(jnp.float32) * float(cols) + srow
        code_red = jnp.max(jnp.where(is_best, code, -1.0),
                           axis=0, keepdims=True)
        new_row = jnp.where(found, t_red, cur_row)
        acc_t[pl.ds(c, 1), :] = new_row
        acc_c[pl.ds(c, 1), :] = jnp.where(found, code_red,
                                          acc_c[pl.ds(c, 1), :])
        return new_row

    def _occ_update(c, new_t):
        if STREAM_OCC:
            # refresh the occlusion plane: this chunk's current best
            # (NaN-safe: empty slots yield NaN products, masked out
            # of new_t by the ok-comparisons, so the reduce is clean);
            # row-acc merges already arrive reduced to [1, 128]
            row_min = (new_t if new_t.shape[0] == 1
                       else jnp.min(new_t, axis=0, keepdims=True))
            if any_hit:
                # first-occluder termination (shadow rays — the
                # dominant BDPT ray population): once ANY genuine
                # hit exists under the ray's original cap, its plane
                # goes dead (-1) so no later box can open.  Licensed
                # by the any_hit contract (reported hit need not be
                # the closest); acc_t/acc_c keep the found hit.
                row_min = jnp.where(row_min < tm[pl.ds(c, 1), :],
                                    -1.0, row_min)
            btcur[pl.ds(c, 1), :] = row_min

    def drain(qhead):
        slot = qhead & (NBUF - 1)
        if not STREAM_SYNCDMA:
            pltpu.make_async_copy(
                leafblocks.at[0], blocks.at[slot], sem.at[slot]
            ).wait()
        if STREAM_DIAG == "nodrain":
            return
        if STREAM_STAGE:
            staged[:, :] = blocks[slot]
            feat = staged[:, :]                            # [KDIM, G*cols]
        else:
            feat = blocks[slot]                            # [KDIM, G*cols]
        fat_id = qleaf[slot]

        def _drain_one(c, feat):
            rf = rayfeat[:, pl.ds(pl.multiple_of(c * LANES, LANES),
                                  LANES)]       # [KDIM, 128]
            # ONE transposed-lhs matmul per chunk covers all four output
            # groups (the block's 4*cols columns are contiguous),
            # amortizing the MXU's fixed per-dot latency: contracting
            # feat dim 0 with rf dim 0 keeps BOTH operands K-major (the
            # DMA-aligned layout) with the transpose folded into the
            # MXU pass.  Precision comes from the operand layout, not
            # the pass count: both sides carry the bf16x6 residual
            # split stacked along K (see STREAM_PREC note at the top).
            # The fat-block id rides the qleaf SMEM table (written at
            # enqueue), and the winner's t/u/v are re-derived exactly
            # by the XLA wrapper.
            prod = jax.lax.dot_general(
                feat, rf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=STREAM_PREC)                     # [4*cols, 128]
            if STREAM_ACC == "row":
                new_t = _merge_row(prod, 0, fat_id, c)
            else:
                new_t, new_c = _merge_hits(prod, 0, fat_id,
                                           acc_t[c], acc_c[c])
                acc_t[c] = new_t
                acc_c[c] = new_c
            _occ_update(c, new_t)
            return 0

        if STREAM_FULLDRAIN:
            jax.lax.fori_loop(
                0, NCHUNK, lambda c, _: _drain_one(c, feat), 0)
        elif STREAM_SKIP == "word":
            for w in range(NMASKW):
                _for_set_bits(qmask[slot, w], w << 4,
                              lambda c: _drain_one(c, feat))
        else:
            span_lo = qmask[slot, NMASKW]
            span_hi = qmask[slot, NMASKW + 1]

            def drain_chunk(c, _):
                live = (qmask[slot, c >> 4] >> (c & 15)) & 1

                @pl.when(live == 1)
                def _():
                    _drain_one(c, feat)

                return 0

            jax.lax.fori_loop(span_lo, span_hi + 1, drain_chunk, 0)

    def drain_multi(qhead, n):
        """Aggregated drain: ``n`` ready ring slots in ONE MXU pass per
        live chunk ([n*4*cols, K] @ [K, 128]) — amortizes the
        per-chunk-visit fixed cost (mask word read, fori bookkeeping,
        acc_t/acc_c read-modify-write, matmul issue latency) across n
        fat-leaf blocks.  Per-row dot products are independent, so each
        block's numbers are bit-identical to n single drains; the merge
        applies the slots in ring order, the same order the single-slot
        path visits them.  A chunk live in only one slot's mask pays all
        n blocks' elementwise merge (the exact ok-window masks the
        foreign blocks' rows), and the occlusion plane refreshes once per
        GROUP instead of once per slot — both conservative-safe.  Worth
        it only if the fixed cost is a large share of the measured
        ~160 ns/chunk-visit (scripts/dma_model.py's open question); the
        hardware A/B (val_tpu_round3.py stream2agg mode: agg rows at
        n=2, agg4 rows at n=4 with a deeper ring) decides, and
        tune_from_session.py flips the ``stream_agg`` tuned default on a
        double win.  n=4 also multiplies the foreign-merge cost on
        disjoint live-chunk sets, so its sign can differ from n=2's."""
        slots = [(qhead + k) & (NBUF - 1) for k in range(n)]
        if not STREAM_SYNCDMA:
            # under SYNCDMA the enqueue path already consumed each
            # slot's semaphore with cp.wait(); waiting again here would
            # block on a never-signaled semaphore and hang on hardware
            for s in slots:
                pltpu.make_async_copy(
                    leafblocks.at[0], blocks.at[s], sem.at[s]
                ).wait()
        if STREAM_DIAG == "nodrain":
            return
        feat = jnp.concatenate(
            [blocks[s] for s in slots], axis=1)            # [KDIM, n*G*cols]
        fats = [qleaf[s] for s in slots]

        def _drain_group(c, feat):
            rf = rayfeat[:, pl.ds(pl.multiple_of(c * LANES, LANES),
                                  LANES)]       # [KDIM, 128]
            prod = jax.lax.dot_general(
                feat, rf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=STREAM_PREC)                     # [n*G*cols, 128]
            if STREAM_ACC == "row":
                new_t = None
                for k in range(n):
                    new_t = _merge_row(prod, k * GROUPS * cols,
                                       fats[k], c)
            else:
                t_c, c_c = acc_t[c], acc_c[c]
                for k in range(n):
                    t_c, c_c = _merge_hits(prod, k * GROUPS * cols,
                                           fats[k], t_c, c_c)
                acc_t[c] = t_c
                acc_c[c] = c_c
                new_t = t_c
            _occ_update(c, new_t)
            return 0

        def _or_word(w):
            word = qmask[slots[0], w]
            for s in slots[1:]:
                word = word | qmask[s, w]
            return word

        if STREAM_SKIP == "word":
            for w in range(NMASKW):
                _for_set_bits(_or_word(w), w << 4,
                              lambda c: _drain_group(c, feat))
        else:
            def drain_chunk(c, _):
                live = (_or_word(c >> 4) >> (c & 15)) & 1

                @pl.when(live == 1)
                def _():
                    _drain_group(c, feat)

                return 0

            span_lo = qmask[slots[0], NMASKW]
            span_hi = qmask[slots[0], NMASKW + 1]
            for s in slots[1:]:
                span_lo = jnp.minimum(span_lo, qmask[s, NMASKW])
                span_hi = jnp.maximum(span_hi, qmask[s, NMASKW + 1])
            jax.lax.fori_loop(span_lo, span_hi + 1, drain_chunk, 0)

    # ---- node phase: pop SMEM nodes, DMA fat-leaf children -----------------
    def node_phase(carry):
        def cond(c):
            sp, qhead, qcount = c
            return (sp > 0) & (qcount < NBUF - 1)

        def body(c):
            sp, qhead, qcount = c
            node = stack[sp - 1]
            sp = sp - 1

            near_a, live_a = box_test(node, 0, cap_plane())
            near_b, live_b = box_test(node, 6, cap_plane())
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
                cp = pltpu.make_async_copy(
                    leafblocks.at[-(ca + 1)], blocks.at[slot_a],
                    sem.at[slot_a],
                )
                cp.start()
                if STREAM_SYNCDMA:
                    cp.wait()
                qleaf[slot_a] = -(ca + 1)
                write_masks(live_a, slot_a)

            @pl.when(enq_b)
            def _():
                cp = pltpu.make_async_copy(
                    leafblocks.at[-(cb + 1)], blocks.at[slot_b],
                    sem.at[slot_b],
                )
                cp.start()
                if STREAM_SYNCDMA:
                    cp.wait()
                qleaf[slot_b] = -(cb + 1)
                write_masks(live_b, slot_b)

            qcount = qcount + enq_a.astype(jnp.int32) + enq_b.astype(jnp.int32)
            return sp, qhead, qcount

        return jax.lax.while_loop(cond, body, carry)

    stack[0] = 0

    def outer_cond(c):
        sp, qhead, qcount = c
        return (sp > 0) | (qcount > 0)

    def outer_body(c):
        sp, qhead, qcount = node_phase(c)

        if agg == 4:
            @pl.when(qcount >= 4)
            def _():
                drain_multi(qhead, 4)

            @pl.when((qcount >= 2) & (qcount < 4))
            def _():
                drain_multi(qhead, 2)

            @pl.when(qcount == 1)
            def _():
                drain(qhead)

            adv = jnp.where(qcount >= 4, 4,
                            jnp.where(qcount >= 2, 2, qcount))
        elif agg == 2:
            @pl.when(qcount > 1)
            def _():
                drain_multi(qhead, 2)

            @pl.when(qcount == 1)
            def _():
                drain(qhead)

            adv = jnp.minimum(qcount, 2)
        else:
            @pl.when(qcount > 0)
            def _():
                drain(qhead)

            adv = jnp.minimum(qcount, 1)
        qhead = qhead + adv
        qcount = qcount - adv
        return sp, qhead, qcount

    final = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(1), jnp.int32(0), jnp.int32(0)),
    )

    # ---- fold: one winner per ray — a SUBLANE min-reduce per chunk ---------
    # acc_c holds ABSOLUTE slot codes (fat_id * cols + tri-slot-row, in
    # exact f32 — pack_stream2 checks total slots < 2^24).  The [1, 128]
    # result rows store straight into the plane-layout outputs at
    # dynamic SUBLANE offset c (dynamic sublane indexing is legal;
    # dynamic LANE indexing is not — which is what forced the old
    # rays-in-sublanes orientation through a [128, 128] iota-select
    # carry).  Row-acc mode arrives pre-reduced: the fold is two plane
    # copies.
    if STREAM_ACC == "row":
        out_t[:, :] = acc_t[:, :]
        out_code[:, :] = acc_c[:, :]
    else:
        def fold_chunk(c, _):
            t_c = acc_t[c]                                 # [cols, 128]
            t_red = jnp.min(t_c, axis=0, keepdims=True)    # [1, 128]
            is_best = (t_c == jnp.broadcast_to(t_red, t_c.shape)) \
                & (acc_c[c] >= 0.0)
            code = jnp.max(
                jnp.where(is_best, acc_c[c], -1.0),
                axis=0, keepdims=True,
            )
            out_t[pl.ds(c, 1), :] = t_red
            out_code[pl.ds(c, 1), :] = code
            return 0

        jax.lax.fori_loop(0, NCHUNK, fold_chunk, 0)
    if STREAM_DIAG == "count":
        # drain count == final qhead (incremented once per drain);
        # corrupts ray row 0 of the packet — diag only.
        out_t[0:1, :] = jnp.full(
            (1, LANES), 1.0, jnp.float32) * final[1].astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "cols", "interpret",
                                    "any_hit", "agg"))
def _traverse_blocks(nodebox, childs, leafblocks, rayfeat, planes,
                     n_blocks: int, cols: int, interpret: bool = False,
                     any_hit: bool = False, agg: int = 1):
    plane = lambda: pl.BlockSpec(
        (RAY_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks * RAY_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * RAY_ROWS, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        _make_kernel(cols, any_hit, agg),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # nodebox
            pl.BlockSpec(memory_space=pltpu.SMEM),          # childs
            pl.BlockSpec(memory_space=pl.ANY),              # fat blocks: HBM
            pl.BlockSpec((KDIM, BLOCK_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # ray features
        ] + [plane()] * 7,
        out_specs=[plane(), plane()],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((NBUF, NMASKW + 2), jnp.int32),     # bits + lo/hi
            pltpu.SMEM((NBUF,), jnp.int32),                # slot fat ids
            (pltpu.VMEM((NCHUNK, LANES), jnp.float32)
             if STREAM_ACC == "row" else
             pltpu.VMEM((NCHUNK, cols, LANES), jnp.float32)),
            (pltpu.VMEM((NCHUNK, LANES), jnp.float32)
             if STREAM_ACC == "row" else
             pltpu.VMEM((NCHUNK, cols, LANES), jnp.float32)),
            pltpu.VMEM((NBUF, KDIM, GROUPS * cols), jnp.bfloat16),
            pltpu.VMEM((KDIM, GROUPS * cols), jnp.bfloat16),   # stage
            pltpu.VMEM((RAY_ROWS, LANES), jnp.float32),    # occlusion plane
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(nodebox, childs, leafblocks, rayfeat,
      planes["ox"], planes["oy"], planes["oz"],
      planes["dx"], planes["dy"], planes["dz"], planes["tm"])


def build_rayfeat(origin, direction, ctr):
    """[n, KDIM] NATIVE-bf16 ray features: the 10 live base features
    (center-shifted for conditioning, see module docstring) as a 3-term bf16
    residual split r = r1 + r2 + r3, laid out [r1|r2|r3|r1|r2|r1] so one
    MXU pass against the block's [B1;B1;B1;B2;B2;B3] computes the six
    dominant bf16x6 cross products (~f32 accuracy; error ~2^-23).

    bf16x3 (hi/lo, K=48) measurably FAILED here: the bilinear MT forms
    cancel ~500x on adversarial geometry (terms ~|osh||e| vs results
    ~u*|n|), so its 2^-17 term-relative noise let near-parallel FOREIGN
    triangles (every drained leaf is tested against the whole packet)
    spuriously pass the ok-window and steal wins — measured 35% wrong
    winners / ghost hits on a 200k-sliver scene vs 0% under the 6-pass
    f32-HIGHEST reference semantics.  K=64 (6 sections of the 10 live
    columns + pad) still pads to one 128-deep MXU pass, so the only cost
    vs bf16x3 is DMA bytes.  Exact per-ray caps travel separately
    (``capt``)."""
    osh = origin - ctr[None, :]
    m = jnp.cross(osh, direction)
    n = origin.shape[0]
    feat = jnp.concatenate([
        direction, m, osh, jnp.ones((n, 1), jnp.float32),
    ], axis=1)                                             # [n, LIVE=10]
    # The residual split MUST use lax.reduce_precision, not an
    # f32->bf16->f32 convert round-trip: under jit, XLA:TPU runs with
    # allow_excess_precision and ELIDES the convert pair, so
    # ``feat - f32(bf16(feat))`` folds to zero and the bf16x6 split
    # silently degrades to plain bf16 — reproducing the exact ~35%
    # wrong-winner failure the split exists to prevent.  Found
    # 2026-08-20: eager and jitted build_rayfeat produced different
    # residual rows on the TPU backend (38.7% of cells; every isolated
    # kernel probe passed because the wrongness is created OUTSIDE the
    # kernel, in the fused input program).  reduce_precision has
    # explicit rounding semantics XLA cannot optimize away.
    def bf16_round(x):
        return jax.lax.reduce_precision(x, exponent_bits=8,
                                        mantissa_bits=7)

    r1f = bf16_round(feat)
    rem = feat - r1f
    r2f = bf16_round(rem)
    r3f = bf16_round(rem - r2f)
    r1 = r1f.astype(jnp.bfloat16)
    r2 = r2f.astype(jnp.bfloat16)
    r3 = r3f.astype(jnp.bfloat16)
    # transposed (K-major) for the rays-in-lanes drain matmul RHS;
    # 6 sections x 10 live columns + 4 zero pad = KDIM
    out = jnp.concatenate([r1, r2, r3, r1, r2, r1], axis=1)  # [n, 60]
    return jnp.pad(out, ((0, 0), (0, KDIM - 6 * LIVE))).T    # [KDIM, n]


def intersect_stream2(origin, direction, packed, active=None, sort=False,
                      t_max=None, interpret=False, any_hit=False, agg=None):
    """Closest hit via the MXU streaming kernel; same contract as
    intersect_bvh.  ``any_hit`` licenses first-occluder termination: the
    drain kills a ray's occlusion plane on its first genuine hit under
    the original cap, so later fat leaves never open for it (the model
    says shadow casts are the worst streaming regime; this trims their
    visits).  Requires CLIVE2_STREAM_OCC=1 (default); with culling off
    the closest-under-cap answer is still a valid any-hit answer.
    ``agg`` = ring slots drained per MXU pass (see drain_multi): 1 (or
    False) single-slot, 2 (or True) dual-slot, 4 quad-slot (needs an
    NBUF>=8 ring to ever see 4 ready slots; silently clamped to 2
    otherwise so a tuned default can't crash a shallow-ring run).  None
    defers to CLIVE2_STREAM_AGG ("0"/"1"/"2"/"4" — "1" means dual-slot
    for back-compat), then the deployment-tuned ``stream_agg``."""
    if agg is None:
        raw = (os.environ.get("CLIVE2_STREAM_AGG")
               or tuned_default("stream_agg", "0"))
        agg = {"0": 1, "1": 2, "2": 2, "4": 4}.get(str(raw), 1)
    elif agg is True:
        agg = 2
    elif not agg:
        agg = 1
    agg = int(agg)
    if agg == 4 and NBUF < 8:
        agg = 2
    if sort and "lo" in packed:
        key = _morton_key(origin, direction, packed["lo"], packed["hi"],
                          active=active)
        order = jnp.argsort(key)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        i, t, u, v = intersect_stream2(
            origin[order], direction[order], packed,
            active=None if active is None else active[order], sort=False,
            t_max=None if t_max is None else t_max[order],
            interpret=interpret, any_hit=any_hit, agg=agg,
        )
        return i[inv], t[inv], u[inv], v[inv]

    n = origin.shape[0]
    n_pad = max(BLOCK_RAYS, ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS)
    n_blocks = n_pad // BLOCK_RAYS
    cap = MAX_BLOCKS_PER_CALL
    n_super = 1
    if n_blocks > cap:
        n_super = (n_blocks + cap - 1) // cap
        n_blocks = n_super * cap
        n_pad = n_blocks * BLOCK_RAYS

    act = (jnp.ones((n,), bool) if active is None else active)
    tm = jnp.full((n,), INF) if t_max is None else t_max
    # inactive rays carry cap -1: nothing beats it in the drain, and the
    # node phase's slab test can't open any interval under it.  INF caps
    # are clamped to a finite sentinel (far beyond any scene t) so drain
    # arithmetic never sees inf.
    tmp = jnp.where(act, jnp.minimum(tm, 1e30), -1.0)

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * RAY_ROWS, LANES)

    planes = dict(
        ox=plane(origin[:, 0], 0.0), oy=plane(origin[:, 1], 0.0),
        oz=plane(origin[:, 2], 0.0),
        dx=plane(direction[:, 0], 1.0), dy=plane(direction[:, 1], 0.0),
        dz=plane(direction[:, 2], 0.0),
        tm=plane(tmp, -1.0),
    )

    rayfeat = jnp.zeros((KDIM, n_pad), jnp.bfloat16).at[:, :n].set(
        build_rayfeat(origin, direction, packed["ctr"])
    )

    cols = packed["leafblocks"].shape[2] // GROUPS

    def run(rf, pls, blocks_count):
        return _traverse_blocks(
            packed["nodebox"], packed["childs"], packed["leafblocks"],
            rf, pls, blocks_count, cols, interpret=interpret,
            any_hit=bool(any_hit and STREAM_OCC), agg=agg,
        )

    if n_super > 1:
        rf_st = jnp.moveaxis(
            rayfeat.reshape(KDIM, n_super, cap * BLOCK_RAYS), 1, 0)
        pl_st = {k: v.reshape(n_super, cap * RAY_ROWS, LANES)
                 for k, v in planes.items()}
        outs = jax.lax.map(
            lambda args: run(args[0], args[1], cap), (rf_st, pl_st)
        )
        t_pk, code_pk = (
            o.reshape(n_blocks * RAY_ROWS, LANES) for o in outs)
    else:
        t_pk, code_pk = run(rayfeat, planes, n_blocks)

    # outputs are already in flat plane layout (row c = chunk c's rays)
    t_flat = t_pk.reshape(n_pad)[:n]
    code_flat = code_pk.reshape(n_pad)[:n]

    code_i = code_flat.astype(jnp.int32)
    hit = code_i >= 0
    tri = jnp.where(
        hit, jnp.take(packed["slot_tri"], jnp.maximum(code_i, 0)), -1
    )

    # exact u, v: one scalar Möller-Trumbore on each ray's single winner
    safe = jnp.maximum(tri, 0)
    v0 = jnp.take(packed["tri_v0"], safe, axis=0)
    e1 = jnp.take(packed["tri_e1"], safe, axis=0)
    e2 = jnp.take(packed["tri_e2"], safe, axis=0)
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=1)
    f = 1.0 / a
    s = origin - v0
    u = f * jnp.sum(s * h, axis=1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=1)
    t_exact = f * jnp.sum(e2 * q, axis=1)

    t_out = jnp.where(hit, t_exact, INF)
    return (
        tri.astype(jnp.int32),
        t_out,
        jnp.where(hit, u, 0.0),
        jnp.where(hit, v, 0.0),
    )


def pack_stream2(bvh, soup, leaf=None, blocks_per_leaf=1):
    """FlatBVH -> MXU streaming layout: SMEM top tree (identical to
    pack_stream) + HBM bilinear-feature fat-leaf blocks
    [n_fat, KDIM, GROUPS*cols] bf16 (K-MAJOR, bf16x6 K split — K in
    sublanes keeps the per-leaf DMA slice lane-aligned and the VMEM ring
    unpadded, see module docstring) + slot->triangle table + global
    triangle arrays for the XLA u,v recovery."""
    from ..bvh.build import leaf_tables

    if bvh.max_leaf_size > SUB_SLOTS:
        raise ValueError("pack_stream2 expects a tree built with leaves <= 8")
    is_leaf = bvh.leaf_id >= 0
    if is_leaf[0]:
        raise ValueError("streaming kernel requires an inner root")
    n_nodes = bvh.n_nodes
    cols = LANES * blocks_per_leaf
    max_subleaves = cols // SUB_SLOTS

    cut_mask, _ = _cut_mask(bvh, max_subleaves)
    cuts = np.nonzero(cut_mask)[0]
    cut_of = np.full(n_nodes, -1, dtype=np.int64)
    cut_of[cuts] = np.arange(len(cuts))

    under = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(under, cuts, 1)
    np.add.at(under, bvh.miss[cuts], -1)
    under = np.cumsum(under[:-1]) > 0
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

    # bf16-packed boxes: one i32 word holds (min, max) of one axis —
    # min rounded toward -inf, max toward +inf, so the slab test stays
    # CONSERVATIVE (boxes inflate <= 0.4%, adding only spurious visits,
    # never losing hits).  56 -> 32 B/node of SMEM: at sponza scale this
    # is what lets blocks_per_leaf stay 1 under the SMEM budget (the DMA
    # model says bpl=1 halves the MXU drain bound vs the bpl=2 fallback),
    # and the node phase does 6 scalar loads per box test instead of 12.
    nodebox = np.zeros((len(top), 6), dtype=np.uint32)
    for a in range(3):
        nodebox[:, 0 + a] = _pack_minmax(bvh.node_mins[left][:, a],
                                         bvh.node_maxes[left][:, a])
        nodebox[:, 3 + a] = _pack_minmax(bvh.node_mins[right][:, a],
                                         bvh.node_maxes[right][:, a])
    nodebox = nodebox.ravel().view(np.int32)

    tables = leaf_tables(bvh, soup) if leaf is None else leaf

    n_fat = len(cuts)
    leaf_nodes = np.nonzero(is_leaf)[0]
    fat_ids = np.searchsorted(cuts, leaf_nodes, side="right") - 1
    if not ((fat_ids >= 0).all()
            and (leaf_nodes < bvh.miss[cuts[fat_ids]]).all()):
        raise AssertionError("leaf outside every cut subtree")
    first_of_fat = np.full(n_fat, len(leaf_nodes), dtype=np.int64)
    np.minimum.at(first_of_fat, fat_ids, np.arange(len(leaf_nodes)))
    sub_idx = np.arange(len(leaf_nodes)) - first_of_fat[fat_ids]
    assert (sub_idx >= 0).all() and (sub_idx < max_subleaves).all()

    lids = bvh.leaf_id[leaf_nodes]

    # dense per-slot triangle attributes [n_fat, cols, 3]
    def scatter3(vals):                                    # [L, 8, 3]
        g = np.zeros((n_fat, max_subleaves, SUB_SLOTS, 3), np.float32)
        g[fat_ids, sub_idx] = vals
        return g.reshape(n_fat, cols, 3)

    v0 = scatter3(tables["v0"][lids])
    e1 = scatter3(tables["e1"][lids])
    e2 = scatter3(tables["e2"][lids])
    tri_id = np.full((n_fat, max_subleaves, SUB_SLOTS), -1, np.int32)
    tri_id[fat_ids, sub_idx] = tables["tri_index"][lids]
    tri_id = tri_id.reshape(n_fat, cols)
    filled = tri_id >= 0

    ctr = 0.5 * (bvh.node_mins[0] + bvh.node_maxes[0]).astype(np.float32)
    v0s = np.where(filled[..., None], v0 - ctr, 0.0)
    e1 = np.where(filled[..., None], e1, 0.0)
    e2 = np.where(filled[..., None], e2, 0.0)
    nrm = np.cross(e1, e2)

    # feature rows (see module docstring); empty slots are all-zero ->
    # a = 0 -> u, v, t = NaN -> masked by the comparisons.  The fat-block
    # id does NOT ride the matmul (round-4 carried it as a 5th product
    # group; it is a per-block scalar, so the kernel reads it from the
    # qleaf SMEM table written at enqueue) — slot codes are
    # fat_id * cols + row in exact f32, hence the 2^24 slot cap.
    blocks = np.zeros((n_fat, FEAT, GROUPS * cols), dtype=np.float32)
    blocks[:, 0:3, 0 * cols:1 * cols] = -np.transpose(nrm, (0, 2, 1))
    blocks[:, 0:3, 1 * cols:2 * cols] = np.transpose(
        np.cross(v0s, e2), (0, 2, 1))
    blocks[:, 3:6, 1 * cols:2 * cols] = np.transpose(e2, (0, 2, 1))
    blocks[:, 0:3, 2 * cols:3 * cols] = -np.transpose(
        np.cross(v0s, e1), (0, 2, 1))
    blocks[:, 3:6, 2 * cols:3 * cols] = -np.transpose(e1, (0, 2, 1))
    blocks[:, 6:9, 3 * cols:4 * cols] = np.transpose(nrm, (0, 2, 1))
    blocks[:, 9, 3 * cols:4 * cols] = -np.sum(v0s * nrm, axis=2)
    if n_fat * cols >= (1 << 24):
        raise ValueError("stream2: > 2^24 fat-leaf slots; raise "
                         "blocks_per_leaf")

    # K-MAJOR [n_fat, KDIM, G*cols]: K lives in SUBLANES (the FEAT-row
    # axis the features were built on — no transpose needed), triangles
    # in LANES, so the per-leaf DMA slice is [64, 5*128] — lane-dim
    # 128-aligned as Mosaic requires (the tri-major layout with K=64 in
    # lanes failed hardware compile, see module docstring) and pad-free
    # in VMEM.  The bf16x6 residual split stacks along K:
    # [B1;B1;B1;B2;B2;B3] pairs with the ray side's [r1|r2|r3|r1|r2|r1]
    # so ONE transposed-lhs MXU pass on native-bf16 operands computes
    # the six dominant cross products (~f32 accuracy — see build_rayfeat
    # for why bf16x3 was insufficient).  Only the LIVE=10 feature rows
    # are stored (60 + 4 zero pad = KDIM bf16 K-rows = 2x the v1
    # kernel's 16-f32-row bytes per triangle slot; the dead 6 columns per
    # section were another 50% on top of that — pure DMA waste).
    import ml_dtypes
    blocks = blocks[:, :LIVE, :]                           # [nf, 10, G*c]
    b1 = blocks.astype(ml_dtypes.bfloat16)
    rem = blocks - b1.astype(np.float32)
    b2 = rem.astype(ml_dtypes.bfloat16)
    b3 = (rem - b2.astype(np.float32)).astype(ml_dtypes.bfloat16)
    blocks = np.concatenate([b1, b1, b1, b2, b2, b3], axis=1)  # [nf, 60, G*c]
    blocks = np.pad(blocks, ((0, 0), (0, KDIM - 6 * LIVE), (0, 0)))

    # global triangle arrays for exact u,v recovery (original coords)
    t_count = int(soup.vertices.shape[0])
    g_v0 = soup.vertices[:, 0].astype(np.float32)
    g_e1 = (soup.vertices[:, 1] - soup.vertices[:, 0]).astype(np.float32)
    g_e2 = (soup.vertices[:, 2] - soup.vertices[:, 0]).astype(np.float32)

    return dict(
        nodebox=nodebox,
        childs=childs,
        leafblocks=blocks,
        slot_tri=tri_id.reshape(n_fat * cols),
        tri_v0=g_v0, tri_e1=g_e1, tri_e2=g_e2,
        ctr=ctr,
        lo=bvh.node_mins[0].astype(np.float32),
        hi=bvh.node_maxes[0].astype(np.float32),
    )


def smem_bytes(packed) -> int:
    return int(packed["nodebox"].size + packed["childs"].size) * 4


def hbm_bytes(packed) -> int:
    return int(packed["leafblocks"].size) * 2              # native bf16
