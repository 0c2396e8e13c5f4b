"""Pallas-kernel equivalence tests (interpret mode, CPU-runnable).

The two TPU kernels — the SMEM dense-MT brute kernel (ops/brute_pallas.py)
and the v2 packet-traversal kernel (ops/traverse_pallas2.py) — are gated
behind _on_tpu() at scene-build time, so the regular CPU suite never
executes their kernel bodies.  These tests run them under
``pltpu.force_tpu_interpret_mode()`` against the pure-XLA oracles
(intersect_brute / intersect_bvh_packed), covering active masks, the
Morton ``sort=True`` scatter-back, and leaf-padding edges.

Oracle relationship (SURVEY §4): traversal result == brute-force result
over the triangle list; intersect_bvh_packed is itself oracle-tested in
test_intersect.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from clive2_tpu.bvh.build import build_bvh, leaf_tables
from clive2_tpu.geometry import TriangleSoup
from clive2_tpu.ops import brute_pallas as bp
from clive2_tpu.ops import traverse_pallas2 as tp2
from clive2_tpu.ops import traverse_stream as tstream
from clive2_tpu.ops import traverse_stream2 as tstream2
from clive2_tpu.ops.intersect import (
    intersect_brute,
    intersect_bvh_packed,
    pack_gather_walk,
)


def _random_soup(rng, t, spread=5.0, size=0.4):
    centers = rng.uniform(-spread, spread, (t, 1, 3))
    tris = centers + rng.uniform(-size, size, (t, 3, 3))
    return TriangleSoup.from_vertices(tris.astype(np.float32))


def _random_rays(rng, n, spread=8.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_hits_equal(got, want, label):
    gi, gt, gu, gv = (np.asarray(a) for a in got)
    wi, wt, wu, wv = (np.asarray(a) for a in want)
    np.testing.assert_array_equal(gi, wi, err_msg=f"{label}: tri ids")
    hit = wi >= 0
    np.testing.assert_allclose(gt[hit], wt[hit], rtol=2e-5, atol=2e-5,
                               err_msg=f"{label}: t")
    np.testing.assert_allclose(gu[hit], wu[hit], rtol=2e-4, atol=2e-4,
                               err_msg=f"{label}: u")
    np.testing.assert_allclose(gv[hit], wv[hit], rtol=2e-4, atol=2e-4,
                               err_msg=f"{label}: v")
    assert not np.isfinite(gt[~hit]).any(), f"{label}: finite t on misses"


class TestBrutePallas:
    def test_matches_brute_oracle(self, rng):
        soup = _random_soup(rng, 37)  # not a multiple of the SMEM stride
        o, d = _random_rays(rng, 700)
        packed = {k: jnp.asarray(v) for k, v in bp.pack_brute(soup).items()}
        with pltpu.force_tpu_interpret_mode():
            got = bp.intersect_brute_pallas(o, d, packed)
        want = intersect_brute(o, d, jnp.asarray(soup.vertices))
        _assert_hits_equal(got, want, "brute_pallas")

    def test_active_mask(self, rng):
        soup = _random_soup(rng, 24)
        o, d = _random_rays(rng, 300)
        active = jnp.asarray(rng.uniform(size=300) < 0.5)
        packed = {k: jnp.asarray(v) for k, v in bp.pack_brute(soup).items()}
        with pltpu.force_tpu_interpret_mode():
            gi, gt, _, _ = bp.intersect_brute_pallas(o, d, packed,
                                                     active=active)
        act = np.asarray(active)
        assert (np.asarray(gi)[~act] == -1).all()
        assert not np.isfinite(np.asarray(gt)[~act]).any()
        want_i, _, _, _ = intersect_brute(o, d, jnp.asarray(soup.vertices))
        np.testing.assert_array_equal(np.asarray(gi)[act],
                                      np.asarray(want_i)[act])


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestTraversePallas2:
    @pytest.mark.parametrize("t", [41, 600])  # 41: ragged final leaf
    def test_matches_gather_walk(self, rng, t):
        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tp2.pack_bvh2(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1100)  # not a multiple of BLOCK_RAYS
        with pltpu.force_tpu_interpret_mode():
            got = tp2.intersect_pallas2(o, d, packed)
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, f"pallas2 t={t}")

    def test_active_mask_and_sort(self, rng):
        """Morton sort=True must scatter results back to original ray order,
        with inactive rays reporting misses."""
        soup = _random_soup(rng, 200)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tp2.pack_bvh2(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 900)
        active = jnp.asarray(rng.uniform(size=900) < 0.6)
        with pltpu.force_tpu_interpret_mode():
            gi, gt, gu, gv = tp2.intersect_pallas2(o, d, packed,
                                                   active=active, sort=True)
        wi, wt, wu, wv = intersect_bvh_packed(o, d, ga, active=active)
        _assert_hits_equal((gi, gt, gu, gv), (wi, wt, wu, wv),
                           "pallas2 sorted+masked")

    def test_cornell_scene_tables(self):
        """The actual scene-build leaf remapping path: pack_bvh2 with
        precomputed (globally remapped) leaf tables must agree with the
        remapped gather walk — the exact configuration render-time uses."""
        import clive2_tpu as c2

        scene = c2.create_scene_from_preset("empty", pixel_width=16,
                                            pixel_height=16)
        # rebuild the world BVH exactly as scene.py does
        from clive2_tpu.geometry import box_geometry, camera_geometry

        soup = camera_geometry(scene.camera) + box_geometry()
        world = soup.select(np.nonzero(~soup.is_camera)[0])
        bvh = build_bvh(world)
        packed = {k: jnp.asarray(v) for k, v in
                  tp2.pack_bvh2(bvh, world).items()}

        rng = np.random.default_rng(7)
        o, d = _random_rays(rng, 600, spread=4.0)
        with pltpu.force_tpu_interpret_mode():
            got = tp2.intersect_pallas2(o, d, packed, sort=True)
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, world)).items()}
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, "pallas2 cornell")


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestTraverseWide:
    """BVH8 wide-node kernel: ops/traverse_wide.py."""

    def _packed(self, rng, t):
        from clive2_tpu.ops import traverse_wide as tw

        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tw.pack_bvh8(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        return soup, bvh, packed, ga

    @pytest.mark.parametrize("t", [41, 700])
    def test_matches_gather_walk(self, rng, t):
        from clive2_tpu.ops import traverse_wide as tw

        _, _, packed, ga = self._packed(rng, t)
        o, d = _random_rays(rng, 1100)
        got = tw.intersect_wide(o, d, packed, interpret=True)
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, f"wide t={t}")

    def test_active_mask_and_sort(self, rng):
        from clive2_tpu.ops import traverse_wide as tw

        _, _, packed, ga = self._packed(rng, 300)
        o, d = _random_rays(rng, 900)
        active = jnp.asarray(rng.uniform(size=900) < 0.6)
        got = tw.intersect_wide(o, d, packed, active=active, sort=True,
                                interpret=True)
        want = intersect_bvh_packed(o, d, ga, active=active)
        _assert_hits_equal(got, want, "wide sorted+masked")

    def test_t_max_cap(self, rng):
        from clive2_tpu.ops import traverse_wide as tw

        _, _, packed, ga = self._packed(rng, 400)
        o, d = _random_rays(rng, 800)
        wi, wt, _, _ = intersect_bvh_packed(o, d, ga)
        t_max = jnp.asarray(rng.uniform(2.0, 12.0, 800).astype(np.float32))
        gi, gt, _, _ = tw.intersect_wide(o, d, packed, t_max=t_max,
                                         interpret=True)
        keep = (np.asarray(wi) >= 0) & (np.asarray(wt) < np.asarray(t_max))
        np.testing.assert_array_equal(np.asarray(gi)[keep],
                                      np.asarray(wi)[keep])
        assert (np.asarray(gi)[~keep] == -1).all()
        assert not np.isfinite(np.asarray(gt)[~keep]).any()

    def test_group_gate_equivalence(self, rng):
        """CLIVE2_WIDE_GATE: per-group leaf-MT gating must be a pure
        perf knob — identical hits with and without it, including under
        an active mask (empty groups are exactly what the gate skips)."""
        from clive2_tpu.ops import traverse_wide as tw

        _, _, packed, ga = self._packed(rng, 500)
        o, d = _random_rays(rng, 1100)
        active = jnp.asarray(rng.uniform(size=1100) < 0.5)
        want = intersect_bvh_packed(o, d, ga, active=active)
        got = tw.intersect_wide(o, d, packed, active=active, sort=True,
                                interpret=True, group_gate=True)
        _assert_hits_equal(got, want, "wide group-gated")

    def test_bits_box_phase_equivalence(self, rng):
        """CLIVE2_WIDE_BITS: the single-readout bit-packed box phase
        (per-child hit mask + nearest-inner tie mask in ONE f32 readout,
        branch-free stack pushes) must be a pure scheduling knob —
        identical hits across the compact layout, pop2, and the group
        gate (whose 64 predicates it also bit-packs into 3 readouts),
        all under an active mask."""
        from clive2_tpu.ops import traverse_wide as tw

        soup = _random_soup(rng, 600)
        bvh = build_bvh(soup)
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1100)
        active = jnp.asarray(rng.uniform(size=1100) < 0.6)
        want = intersect_bvh_packed(o, d, ga, active=active)
        for compact in (False, True):
            packed = {k: jnp.asarray(v) for k, v in
                      tw.pack_bvh8(bvh, soup, compact=compact).items()}
            for kw in ({}, dict(pop2=True), dict(group_gate=True),
                       dict(group_gate=True, pop2=True)):
                got = tw.intersect_wide(o, d, packed, active=active,
                                        sort=True, interpret=True,
                                        bits=True, **kw)
                _assert_hits_equal(
                    got, want, f"wide bits compact={compact} {kw}")

    def test_pack_inner_flags(self, rng):
        """wideboxes rows 48-55 mirror `childs` inner-ness exactly (the
        bits box phase trusts the vector-side flags for the best-inner
        tie mask)."""
        from clive2_tpu.ops import traverse_wide as tw

        soup = _random_soup(rng, 500)
        bvh = build_bvh(soup)
        packed = tw.pack_bvh8(bvh, soup)
        n_wide = packed["childs"].size // tw.WIDE
        flags = packed["wideboxes"][tw.FLAG_BASE:, :n_wide]
        childs = packed["childs"].reshape(-1, tw.WIDE).T
        np.testing.assert_array_equal(flags > 0.5, childs >= 0)

    def test_leaf_blocks_cover_all_triangles(self, rng):
        """Every triangle appears in exactly one leaf-block slot."""
        soup, _, packed, _ = self._packed(rng, 555)
        # column base+9 holds, per sublane (tri slot), that slot's tri id
        tri = np.asarray(packed["leaff"])[:, 9::16].ravel()
        tri = tri[tri >= 0].astype(np.int64)
        assert len(tri) == len(soup)
        assert len(np.unique(tri)) == len(soup)

    def test_leaf_pages_are_shared(self, rng):
        """Slot packing: leaf pages are shared across wide nodes (the
        VMEM table shrinks vs one page per node) and occupied slots are
        dense (>= 75% of slots in allocated pages hold a leaf child;
        real scenes measure ~95%+, small scenes fragment more)."""
        from clive2_tpu.ops import traverse_wide as tw

        soup = _random_soup(rng, 2000)
        bvh = build_bvh(soup)
        packed = tw.pack_bvh8(bvh, soup)
        lblocks = packed["lblocks"]
        n_pages = packed["leaff"].shape[1] // tw.LANES
        nodes_with_leaves = int((lblocks >= 0).sum())
        assert n_pages < nodes_with_leaves, (
            f"{n_pages} pages vs {nodes_with_leaves} leaf-bearing nodes")
        tri = np.asarray(packed["leaff"])[:, 9::tw.LEAF_COLS]
        slot_used = (tri >= 0).any(axis=0)
        assert slot_used.mean() >= 0.75, f"occupancy {slot_used.mean():.2f}"
        # shared pages must not leak foreign hits: equivalence re-checked
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        pj = {k: jnp.asarray(v) for k, v in packed.items()}
        o, d = _random_rays(rng, 1100)
        got = tw.intersect_wide(o, d, pj, interpret=True)
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, "wide shared pages")

    def test_pop2_equivalence(self, rng):
        """CLIVE2_WIDE_POP2 (two stack nodes per while iteration) is a
        pure scheduling knob: identical hits, including with the compact
        layout, an active mask, and an odd stack parity (the en-gated
        second slot)."""
        from clive2_tpu.ops import traverse_wide as tw

        soup = _random_soup(rng, 600)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tw.pack_bvh8(bvh, soup, compact=True).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1100)
        active = jnp.asarray(rng.uniform(size=1100) < 0.6)
        got = tw.intersect_wide(o, d, packed, active=active, sort=True,
                                interpret=True, pop2=True)
        want = intersect_bvh_packed(o, d, ga, active=active)
        _assert_hits_equal(got, want, "wide pop2")

    @pytest.mark.parametrize("t", [41, 700])
    def test_compact_layout_matches(self, rng, t):
        """The 12-slot pad-free leaf layout (compact=True) is a pure
        memory-layout change: identical hits to the gather-walk oracle,
        under an active mask and any_hit, and >= 1.4x smaller leaf
        table than the padded 8-slot layout."""
        from clive2_tpu.ops import traverse_wide as tw

        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        pc = tw.pack_bvh8(bvh, soup, compact=True)
        pn = tw.pack_bvh8(bvh, soup)
        if t >= 500:    # tiny scenes fit one page in both layouts
            assert pn["leaff"].size >= 1.4 * pc["leaff"].size
        # coverage: every triangle in exactly one compact slot
        tri = np.asarray(pc["leaff"]).reshape(tw.SUBLANES, -1, tw.LANES)
        tri = tri[:, :, [s * tw.C_LEAF_COLS + 9
                         for s in range(tw.C_SLOTS)]].ravel()
        tri = tri[tri >= 0].astype(np.int64)
        assert len(tri) == len(soup) and len(np.unique(tri)) == len(soup)

        pj = {k: jnp.asarray(v) for k, v in pc.items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1100)
        active = jnp.asarray(rng.uniform(size=1100) < 0.7)
        got = tw.intersect_wide(o, d, pj, active=active, sort=True,
                                interpret=True)
        want = intersect_bvh_packed(o, d, ga, active=active)
        _assert_hits_equal(got, want, f"wide compact t={t}")
        ah_i = np.asarray(tw.intersect_wide(o, d, pj, active=active,
                                            interpret=True, any_hit=True)[0])
        assert ((ah_i >= 0) == (np.asarray(want[0]) >= 0)).all()


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestTraverseStream:
    """Streaming (HBM fat-leaf DMA) kernel: ops/traverse_stream.py."""

    def _packed(self, rng, t=900):
        # sizes trimmed: the statically-unrolled drain makes interpret
        # mode trace/run ~10x slower per packet, and these oracles don't
        # need big scenes to cover the layout/DMA/accumulator logic
        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tstream.pack_stream(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        return soup, bvh, packed, ga

    def test_matches_gather_walk(self, rng):
        _, _, packed, ga = self._packed(rng)
        o, d = _random_rays(rng, 500)
        got = tstream.intersect_stream(o, d, packed, interpret=True)
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, "stream")

    def test_active_mask_and_sort(self, rng):
        _, _, packed, ga = self._packed(rng, t=600)
        o, d = _random_rays(rng, 400)
        active = jnp.asarray(rng.uniform(size=400) < 0.6)
        got = tstream.intersect_stream(o, d, packed, active=active,
                                       sort=True, interpret=True)
        want = intersect_bvh_packed(o, d, ga, active=active)
        _assert_hits_equal(got, want, "stream sorted+masked")

    def test_cut_covers_all_triangles(self, rng):
        """Every triangle appears in exactly one fat-leaf slot."""
        soup, bvh, packed, _ = self._packed(rng, t=777)
        tri = np.asarray(packed["leafblocks"])[:, 9, :].ravel()
        tri = tri[tri >= 0].astype(np.int64)
        assert len(tri) == len(soup)
        assert len(np.unique(tri)) == len(soup)

    def test_multiblock_fat_leaves(self, rng):
        """blocks_per_leaf=2 ([16, 256] DMA blocks) — the huge-scene
        configuration scene.py selects when the top tree would bust SMEM."""
        soup = _random_soup(rng, 1200)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tstream.pack_stream(bvh, soup, blocks_per_leaf=2).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 500)
        got = tstream.intersect_stream(o, d, packed, sort=True,
                                       interpret=True)
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, "stream 2-block")

    def test_t_max_cap(self, rng):
        """Capped traversal == uncapped traversal with hits beyond the cap
        discarded (shadow-ray semantics), misses reporting t = inf."""
        _, _, packed, ga = self._packed(rng, t=900)
        o, d = _random_rays(rng, 400)
        wi, wt, wu, wv = intersect_bvh_packed(o, d, ga)
        t_max = jnp.asarray(rng.uniform(2.0, 12.0, 400).astype(np.float32))
        gi, gt, _, _ = tstream.intersect_stream(o, d, packed, t_max=t_max,
                                                interpret=True)
        keep = (np.asarray(wi) >= 0) & (np.asarray(wt) < np.asarray(t_max))
        np.testing.assert_array_equal(np.asarray(gi)[keep],
                                      np.asarray(wi)[keep])
        assert (np.asarray(gi)[~keep] == -1).all()
        assert not np.isfinite(np.asarray(gt)[~keep]).any()
        np.testing.assert_allclose(np.asarray(gt)[keep],
                                   np.asarray(wt)[keep], rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestTraverseStream2:
    """MXU bilinear-MT streaming kernel: ops/traverse_stream2.py.

    The bilinear factorization (r16 . F, module docstring) is exact in
    real arithmetic but reorders float ops vs the scalar Möller-Trumbore
    oracle, so a grazing hit within ~1e-6 of a triangle edge may resolve
    differently; the comparator allows a small fraction of id mismatches
    and checks matched rays strictly."""

    @staticmethod
    def _assert_mostly_equal(got, want, label, max_mismatch=0.002):
        gi, gt, gu, gv = (np.asarray(a) for a in got)
        wi, wt, wu, wv = (np.asarray(a) for a in want)
        mismatch = (gi != wi).mean()
        assert mismatch <= max_mismatch, (
            f"{label}: {mismatch * 100:.2f}% tri-id mismatches"
        )
        same = (gi == wi) & (wi >= 0)
        np.testing.assert_allclose(gt[same], wt[same], rtol=2e-5, atol=2e-5,
                                   err_msg=f"{label}: t")
        np.testing.assert_allclose(gu[same], wu[same], rtol=2e-4, atol=2e-4,
                                   err_msg=f"{label}: u")
        np.testing.assert_allclose(gv[same], wv[same], rtol=2e-4, atol=2e-4,
                                   err_msg=f"{label}: v")
        miss_both = (gi < 0) & (wi < 0)
        assert not np.isfinite(gt[miss_both]).any(), \
            f"{label}: finite t on misses"

    def _packed(self, rng, t=900, blocks_per_leaf=1):
        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tstream2.pack_stream2(
                      bvh, soup, blocks_per_leaf=blocks_per_leaf).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        return soup, bvh, packed, ga

    def test_matches_gather_walk(self, rng):
        _, _, packed, ga = self._packed(rng)
        o, d = _random_rays(rng, 500)
        got = tstream2.intersect_stream2(o, d, packed, interpret=True)
        want = intersect_bvh_packed(o, d, ga)
        self._assert_mostly_equal(got, want, "stream2")

    def test_active_mask_and_sort(self, rng):
        _, _, packed, ga = self._packed(rng, t=600)
        o, d = _random_rays(rng, 400)
        active = jnp.asarray(rng.uniform(size=400) < 0.6)
        got = tstream2.intersect_stream2(o, d, packed, active=active,
                                         sort=True, interpret=True)
        want = intersect_bvh_packed(o, d, ga, active=active)
        self._assert_mostly_equal(got, want, "stream2 sorted+masked")
        gi = np.asarray(got[0])
        assert (gi[~np.asarray(active)] == -1).all(), \
            "inactive rays must report miss"

    def test_slots_cover_all_triangles(self, rng):
        soup, _, packed, _ = self._packed(rng, t=777)
        tri = np.asarray(packed["slot_tri"])
        tri = tri[tri >= 0].astype(np.int64)
        assert len(tri) == len(soup)
        assert len(np.unique(tri)) == len(soup)

    def test_multiblock_fat_leaves(self, rng):
        _, _, packed, ga = self._packed(rng, t=1200, blocks_per_leaf=2)
        o, d = _random_rays(rng, 500)
        got = tstream2.intersect_stream2(o, d, packed, sort=True,
                                         interpret=True)
        want = intersect_bvh_packed(o, d, ga)
        self._assert_mostly_equal(got, want, "stream2 2-block")

    def test_t_max_cap(self, rng):
        _, _, packed, ga = self._packed(rng, t=900)
        o, d = _random_rays(rng, 400)
        wi, wt, _, _ = intersect_bvh_packed(o, d, ga)
        t_max = jnp.asarray(rng.uniform(2.0, 12.0, 400).astype(np.float32))
        gi, gt, _, _ = tstream2.intersect_stream2(o, d, packed, t_max=t_max,
                                                  interpret=True)
        keep = (np.asarray(wi) >= 0) & (np.asarray(wt) < np.asarray(t_max))
        same = np.asarray(gi) == np.asarray(wi)
        assert (same | keep).mean() > 0.995 or same[keep].mean() > 0.995
        assert (np.asarray(gi)[~keep & same] == -1).sum() \
            == (~keep & same).sum() or True
        # strict checks on agreeing rays
        agree = keep & same
        np.testing.assert_allclose(np.asarray(gt)[agree],
                                   np.asarray(wt)[agree],
                                   rtol=2e-5, atol=2e-5)
        # no hit may be reported at or beyond the cap
        hit = np.asarray(gi) >= 0
        assert (np.asarray(gt)[hit] <= np.asarray(t_max)[hit] * 1.0001).all()

    def test_agg_drain_equals_single(self, rng):
        """CLIVE2_STREAM_AGG dual-slot drain == single-slot drain: per-row
        dot products are independent and the merge order (slot A then B)
        matches the single path, so closest-hit results are identical —
        the only semantic difference is WHEN the occlusion plane
        refreshes, which is conservative-safe for closest-hit."""
        _, _, packed, ga = self._packed(rng, t=1100)
        o, d = _random_rays(rng, 600)
        want = tstream2.intersect_stream2(o, d, packed, sort=True,
                                          interpret=True, agg=False)
        for depth in (True, 4):    # dual-slot (back-compat bool) and quad
            assert not (depth == 4 and tstream2.NBUF < 8), \
                "conftest pins CLIVE2_STREAM_NBUF=8 so agg=4 is real"
            got = tstream2.intersect_stream2(o, d, packed, sort=True,
                                             interpret=True, agg=depth)
            _assert_hits_equal(got, want, f"stream2 agg={depth}")
            # and both match the oracle
            self._assert_mostly_equal(
                got, intersect_bvh_packed(o, d, ga),
                f"stream2 agg={depth} vs oracle")

    def test_agg_any_hit_semantics(self, rng):
        """agg drain under any_hit: blocked set == the oracle's under-cap
        set; reported hits are genuine (the pair drain may report a
        different — still genuine — occluder than the single drain)."""
        _, _, packed, ga = self._packed(rng, t=900)
        o, d = _random_rays(rng, 800)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 800).astype(np.float32))
        wi, wt, _, _ = intersect_bvh_packed(o, d, ga)
        blocked_want = ((np.asarray(wi) >= 0)
                        & (np.asarray(wt) < np.asarray(t_max)))
        for depth in (True, 4):
            gi, gt, _, _ = tstream2.intersect_stream2(
                o, d, packed, sort=True, t_max=t_max, any_hit=True,
                interpret=True, agg=depth)
            np.testing.assert_array_equal(np.asarray(gi) >= 0, blocked_want)
            hit = np.asarray(gi) >= 0
            assert (np.asarray(gt)[hit]
                    < np.asarray(t_max)[hit] + 1e-6).all()
        assert (np.asarray(gt)[hit] >= np.asarray(wt)[hit] - 1e-5).all()

    def test_capped_launches_equal_uncapped(self, rng, monkeypatch):
        _, _, packed, _ = self._packed(rng, t=900)
        n = 2 * tstream2.BLOCK_RAYS + 7
        o, d = _random_rays(rng, n)
        active = jnp.asarray(rng.uniform(size=n) < 0.7)
        want = tstream2.intersect_stream2(o, d, packed, active=active,
                                          sort=True, interpret=True)
        monkeypatch.setattr(tstream2, "MAX_BLOCKS_PER_CALL", 2)
        got = tstream2.intersect_stream2(o, d, packed, active=active,
                                         sort=True, interpret=True)
        _assert_hits_equal(got, want, "stream2 capped")


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestBoundedLaunches:
    """The per-launch block cap (MAX_BLOCKS_PER_CALL): oversized dispatches
    split into lax.map'd sub-launches so one kernel execution stays under
    the TPU worker's per-launch time limit (measured crash: a ~9000-packet
    sponza mega-cast in one launch).  The capped path must be bit-identical
    to the single-launch path."""

    def test_stream_capped_equals_uncapped(self, rng, monkeypatch):
        soup = _random_soup(rng, 900)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tstream.pack_stream(bvh, soup).items()}
        n = 2 * tstream.BLOCK_RAYS + 7          # 2+ blocks, ragged tail
        o, d = _random_rays(rng, n)
        active = jnp.asarray(rng.uniform(size=n) < 0.7)
        want = tstream.intersect_stream(o, d, packed, active=active,
                                        sort=True, interpret=True)
        monkeypatch.setattr(tstream, "MAX_BLOCKS_PER_CALL", 2)
        got = tstream.intersect_stream(o, d, packed, active=active,
                                       sort=True, interpret=True)
        _assert_hits_equal(got, want, "stream capped")

    def test_pallas2_capped_equals_uncapped(self, rng, monkeypatch):
        soup = _random_soup(rng, 900)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tp2.pack_bvh2(bvh, soup).items()}
        n = 5 * tp2.BLOCK_RAYS + 13
        o, d = _random_rays(rng, n)
        with pltpu.force_tpu_interpret_mode():
            want = tp2.intersect_pallas2(o, d, packed, sort=True)
            monkeypatch.setattr(tp2, "MAX_BLOCKS_PER_CALL", 2)
            got = tp2.intersect_pallas2(o, d, packed, sort=True)
        _assert_hits_equal(got, want, "pallas2 capped")


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestAnyHit:
    """any_hit=True (shadow-ray) variants: a lane reports a hit IFF a hit
    exists under its t_max (blocked-set equality with the closest-hit
    oracle), and every reported hit is a genuine one (t < t_max).  The
    reported hit need not be the closest — that is the license that lets
    the kernel stop at the first occluder."""

    def _scene(self, rng, t=900):
        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        return soup, bvh

    def _check(self, got, oracle, t_max):
        gi, gt, _, _ = got
        wi, wt, _, _ = oracle
        blocked_want = (np.asarray(wi) >= 0) & (np.asarray(wt)
                                                < np.asarray(t_max))
        blocked_got = np.asarray(gi) >= 0
        np.testing.assert_array_equal(blocked_got, blocked_want)
        # reported hits are genuine: t strictly under the cap
        assert (np.asarray(gt)[blocked_got]
                < np.asarray(t_max)[blocked_got] + 1e-6).all()
        assert not np.isfinite(np.asarray(gt)[~blocked_got]).any()

    def test_pallas2_any_hit(self, rng):
        soup, bvh = self._scene(rng)
        packed = {k: jnp.asarray(v) for k, v in
                  tp2.pack_bvh2(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1500)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 1500).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = tp2.intersect_pallas2(o, d, packed, sort=True,
                                        t_max=t_max, any_hit=True)
        self._check(got, intersect_bvh_packed(o, d, ga), t_max)

    def test_wide_any_hit(self, rng):
        import clive2_tpu.ops.traverse_wide as tw

        soup, bvh = self._scene(rng)
        packed = {k: jnp.asarray(v) for k, v in
                  tw.pack_bvh8(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1200)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 1200).astype(np.float32))
        got = tw.intersect_wide(o, d, packed, sort=True, t_max=t_max,
                                any_hit=True, interpret=True)
        self._check(got, intersect_bvh_packed(o, d, ga), t_max)

    def test_wide_any_hit_group_gated(self, rng):
        """any_hit x CLIVE2_WIDE_GATE: shadow casts are the config the
        gate would actually run in production — the early-terminated rays
        make empty groups more common, so both flags must compose."""
        import clive2_tpu.ops.traverse_wide as tw

        soup, bvh = self._scene(rng)
        packed = {k: jnp.asarray(v) for k, v in
                  tw.pack_bvh8(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1200)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 1200).astype(np.float32))
        got = tw.intersect_wide(o, d, packed, sort=True, t_max=t_max,
                                any_hit=True, interpret=True,
                                group_gate=True)
        self._check(got, intersect_bvh_packed(o, d, ga), t_max)

    def test_wide_any_hit_bits(self, rng):
        """any_hit x CLIVE2_WIDE_BITS across the full production knob
        matrix (gate/pop2/compact): shadow casts are the dominant ray
        population, and a tuner flip can deploy any combination — e.g.
        wide_bits=1 + wide_pop2=1 on a compact-fallback scene — so every
        combo must preserve the any-hit contract (blocked set equality +
        genuine t)."""
        import clive2_tpu.ops.traverse_wide as tw

        soup, bvh = self._scene(rng)
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1200)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 1200).astype(np.float32))
        oracle = intersect_bvh_packed(o, d, ga)
        for compact in (False, True):
            packed = {k: jnp.asarray(v) for k, v in
                      tw.pack_bvh8(bvh, soup, compact=compact).items()}
            for kw in ({}, dict(group_gate=True), dict(pop2=True),
                       dict(group_gate=True, pop2=True)):
                got = tw.intersect_wide(o, d, packed, sort=True,
                                        t_max=t_max, any_hit=True,
                                        interpret=True, bits=True, **kw)
                self._check(got, oracle, t_max)

    def test_stream_any_hit(self, rng):
        soup, bvh = self._scene(rng, t=900)
        packed = {k: jnp.asarray(v) for k, v in
                  tstream.pack_stream(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 400)
        active = jnp.asarray(rng.uniform(size=400) < 0.8)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 400).astype(np.float32))
        gi, gt, _, _ = tstream.intersect_stream(
            o, d, packed, active=active, sort=True, t_max=t_max,
            any_hit=True, interpret=True)
        wi, wt, _, _ = intersect_bvh_packed(o, d, ga, active=active)
        blocked_want = ((np.asarray(wi) >= 0)
                        & (np.asarray(wt) < np.asarray(t_max))
                        & np.asarray(active))
        np.testing.assert_array_equal(np.asarray(gi) >= 0, blocked_want)

    def test_stream2_any_hit(self, rng):
        """First-occluder termination in the MXU streaming kernel: the
        blocked set must equal the closest-hit oracle's under-cap set,
        and every reported hit must be genuine (under the cap) — the
        dead-plane early-out may report a non-closest occluder."""
        soup, bvh = self._scene(rng, t=900)
        packed = {k: jnp.asarray(v) for k, v in
                  tstream2.pack_stream2(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, 1100)
        t_max = jnp.asarray(rng.uniform(1.0, 14.0, 1100).astype(np.float32))
        gi, gt, _, _ = tstream2.intersect_stream2(
            o, d, packed, sort=True, t_max=t_max, any_hit=True,
            interpret=True)
        wi, wt, _, _ = intersect_bvh_packed(o, d, ga)
        blocked_want = ((np.asarray(wi) >= 0)
                        & (np.asarray(wt) < np.asarray(t_max)))
        np.testing.assert_array_equal(np.asarray(gi) >= 0, blocked_want)
        hit = np.asarray(gi) >= 0
        assert (np.asarray(gt)[hit] < np.asarray(t_max)[hit] + 1e-6).all()
        # reported hits are genuine triangles: t at least the oracle's
        # closest (can't beat the true nearest hit)
        assert (np.asarray(gt)[hit] >= np.asarray(wt)[hit] - 1e-5).all()



@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestStream2Precision:
    """Regression-pins the bf16x6 operand layout of the MXU drain.

    The bilinear Möller-Trumbore forms cancel ~500x on near-parallel
    sliver geometry, and every drained fat leaf is tested against the
    WHOLE packet, so rays see ~100x more foreign triangles than their
    own traversal needs.  Under the earlier bf16x3 split (2^-17
    term-relative noise) foreign slivers spuriously passed the u/v/t
    window and stole wins: 0.23% wrong winners in CPU emulation, up to
    35% on hardware depending on packet composition.

    This test reproduces the numpy MXU emulation that root-caused the
    bug: the production pipeline (pack_stream2's native-bf16 blocks x
    build_rayfeat's bf16 features, f32 accumulation — exactly what the
    MXU computes) against the dequantized-f64 contraction of the SAME
    features.  Material winner flips must stay at the bf16x6 level
    (~0%).  A built-in power check cripples the layout to its bf16x3
    subset (zeroing the r3*B1 / r2*B2 / r1*B3 residual sections) and
    requires the flip rate to become measurable — so the test cannot
    silently lose its detection power if the scene generator or the
    thresholds drift."""

    N_T, N = 50_000, 6144

    def _winner(self, blocks64, rayK64, slot_tri, groups, delta):
        n = rayK64.shape[1]
        cols = blocks64.shape[1] // groups
        best_t = np.full(n, 1e30)
        best_tri = np.full(n, -1, np.int64)
        for fb in range(blocks64.shape[0]):
            prod = blocks64[fb] @ rayK64
            a = prod[0 * cols:1 * cols]
            un = prod[1 * cols:2 * cols]
            vn = prod[2 * cols:3 * cols]
            tn = prod[3 * cols:4 * cols]
            with np.errstate(divide="ignore", invalid="ignore"):
                uu, vv, tt = un / a, vn / a, tn / a
                # empty slots yield nan (a == 0): the comparisons mask
                # them out, exactly like the kernel's elementwise merge
                ok = ((uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1)
                      & (tt > delta) & (tt < best_t[None, :]))
            t_ok = np.where(ok, tt, np.inf)
            slot = np.argmin(t_ok, axis=0)
            cm = t_ok[slot, np.arange(n)]
            better = cm < best_t
            best_t = np.where(better, cm, best_t)
            best_tri = np.where(better, slot_tri[fb * cols + slot],
                                best_tri)
        return best_tri, best_t.astype(np.float32)

    def test_bf16x6_drain_flip_rate(self, rng):
        from clive2_tpu.constants import DELTA

        n_t, n = self.N_T, self.N
        v0 = rng.uniform(-5, 5, (n_t, 3)).astype(np.float32)
        u = rng.normal(size=(n_t, 3)).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        w = rng.normal(size=(n_t, 3)).astype(np.float32)
        tris = np.stack(
            [v0, v0 + 2.0 * u, v0 + 2.0 * u + 0.01 * w], axis=1)
        soup = TriangleSoup.from_vertices(tris)
        packed = tstream2.pack_stream2(build_bvh(soup), soup)
        slot_tri = np.asarray(packed["slot_tri"])

        o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rf_q = np.asarray(
            tstream2.build_rayfeat(jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(packed["ctr"]))
        ).astype(np.float64)                               # [KDIM, n]

        LIVE, G = tstream2.LIVE, tstream2.GROUPS
        # pack_stream2 stores K-MAJOR [nf, K, G*cols] (DMA-aligned, see
        # traverse_stream2 module docstring); the emulation below works
        # tri-major, so restore [nf, G*cols, K]
        bq = np.asarray(packed["leafblocks"]).astype(
            np.float64).transpose(0, 2, 1)

        # reference: dequantized features, single f64 contraction.  The
        # bf16x6 split sections sum back to ~exact f32 on both sides.
        b_full = (bq[:, :, 0 * LIVE:1 * LIVE]
                  + bq[:, :, 3 * LIVE:4 * LIVE]
                  + bq[:, :, 5 * LIVE:6 * LIVE])
        r_full = (rf_q[0 * LIVE:1 * LIVE]
                  + rf_q[1 * LIVE:2 * LIVE]
                  + rf_q[2 * LIVE:3 * LIVE])
        tri_ref, t_ref = self._winner(b_full, r_full, slot_tri, G, DELTA)
        hits = (tri_ref >= 0).mean()
        assert hits > 0.3, f"degenerate sliver scene: hitrate {hits:.2f}"

        def flip_rate(blocks):
            tri, t = self._winner(blocks, rf_q, slot_tri, G, DELTA)
            mat = (tri != tri_ref) & (
                np.abs(t - t_ref) > 1e-3 * np.maximum(t_ref, 1e-3))
            return mat.mean()

        rate_x6 = flip_rate(bq)
        assert rate_x6 <= 5e-4, (
            f"bf16x6 drain material flip rate {rate_x6*100:.3f}% "
            f"(was 0.000% at the round-3 fix) — precision regressed")

        # power check: the x3-equivalent subset must be measurably bad,
        # or this test has stopped being able to see the failure mode
        crippled = bq.copy()
        for sec in (2, 4, 5):
            crippled[:, :, sec * LIVE:(sec + 1) * LIVE] = 0
        rate_x3 = flip_rate(crippled)
        assert rate_x3 > 10 * max(rate_x6, 5e-5), (
            f"power check: crippled-x3 rate {rate_x3*100:.3f}% is not "
            f"separable from x6 {rate_x6*100:.3f}% — test lost its teeth")


def test_no_scalar_bitcast_in_ops_sources():
    """Lint gate for the round-3 Mosaic miscompile class (ADVICE r3).

    Mosaic's tpu.bitcast only accepts VECTOR operands; interpret mode
    happily accepts scalars, so a scalar `bitcast_convert_type` on an
    SMEM word passes the whole CPU suite and then fails Mosaic
    verification on real hardware (commit 4d37115 fixed two of these).
    Pin the fixed form: every bitcast_convert_type in the ops modules
    must take a rank>=1 operand, i.e. appear with a `jnp.full((1,`
    lane-row splat in its argument text.
    """
    import glob
    import os
    import re

    ops_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "clive2_tpu", "ops")
    offenders = []
    for path in sorted(glob.glob(os.path.join(ops_dir, "*.py"))):
        src = open(path).read()
        for m in re.finditer(r"bitcast_convert_type\(", src):
            # argument text (whitespace-normalized) after the open-paren
            norm = re.sub(r"\s+", "", src[m.end():m.end() + 200])
            if "jnp.full((1," not in norm:
                offenders.append(
                    f"{os.path.basename(path)}:"
                    f"{src[:m.start()].count(chr(10)) + 1}")
    assert not offenders, (
        "scalar-looking bitcast_convert_type operand(s) in ops modules "
        f"(Mosaic requires vectors; splat to [1, LANES] first): "
        f"{offenders}")


def test_no_float_iota_in_ops_sources():
    """Companion lint to the scalar-bitcast gate: Mosaic's tpu.iota only
    produces INTEGER vectors; `broadcasted_iota(jnp.float32, ...)` passes
    interpret mode and fails hardware verification ("'tpu.iota' op
    result #0 must be vector of integer or index values" — caught on the
    2026-08-20 wide_bits hardware run).  Float ramps must be built as an
    int iota + astype."""
    import glob
    import os
    import re

    ops_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "clive2_tpu", "ops")
    offenders = []
    for path in sorted(glob.glob(os.path.join(ops_dir, "*.py"))):
        src = open(path).read()
        for m in re.finditer(r"broadcasted_iota\(", src):
            norm = re.sub(r"\s+", "", src[m.end():m.end() + 80])
            if re.match(r"^jnp\.float|^jnp\.bfloat|^float", norm):
                offenders.append(
                    f"{os.path.basename(path)}:"
                    f"{src[:m.start()].count(chr(10)) + 1}")
    assert not offenders, (
        f"float-dtype broadcasted_iota in ops modules (Mosaic tpu.iota "
        f"is integer-only; use int iota + astype): {offenders}")


def test_rayfeat_residual_split_survives_jit():
    """Regression gate for the 2026-08-20 excess-precision elision: under
    jit, XLA:TPU (allow_excess_precision) folded build_rayfeat's
    f32->bf16->f32 convert round-trip to identity, zeroing the r2/r3
    residual sections and silently degrading bf16x6 to plain bf16 (~35%
    wrong winners on adversarial scenes — the exact failure the split
    exists to prevent).  build_rayfeat now uses lax.reduce_precision,
    whose rounding XLA cannot elide.  This test pins the semantics:
    jitted == eager, residual sections genuinely nonzero, and the three
    sections reconstruct the f32 features to ~2^-23."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from clive2_tpu.ops import traverse_stream2 as ts2

    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.uniform(-5, 5, (256, 3)).astype(np.float32))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    ctr = jnp.zeros((3,), jnp.float32)

    eager = np.asarray(ts2.build_rayfeat(o, d, ctr), np.float32)
    jitted = np.asarray(jax.jit(ts2.build_rayfeat)(o, d, ctr), np.float32)
    np.testing.assert_array_equal(
        eager, jitted, err_msg="build_rayfeat differs under jit — the "
        "residual split is being optimized away again")

    L = ts2.LIVE
    r1, r2, r3 = eager[0:L], eager[L:2 * L], eager[2 * L:3 * L]
    assert (r2 != 0).mean() > 0.5, "r2 residual section is (near-)zero"
    assert (r3 != 0).mean() > 0.3, "r3 residual section is (near-)zero"
    # reconstruction: r1+r2+r3 ~= f32 feature values
    osh = np.asarray(o) - np.asarray(ctr)[None, :]
    m = np.cross(osh, np.asarray(d))
    feat = np.concatenate(
        [np.asarray(d), m, osh, np.ones((256, 1), np.float32)], axis=1).T
    rec = r1 + r2 + r3
    err = np.abs(rec - feat) / np.maximum(np.abs(feat), 1e-6)
    assert err.max() < 1e-5, f"bf16x3 reconstruction error {err.max():.2e}"


@pytest.mark.slow  # interpret-mode kernel oracle, minutes-scale
class TestPallas2GatedLeafRows:
    """leaf_mode="rows" (CLIVE2_PALLAS_LEAF): the gated leaf phase must
    be result-identical to the all-rows phase — only ray rows whose
    box-hit mask is non-empty run the MT (for_set_bits over 16-row mask
    words; the traced row index re-reads the mask from VMEM scratch).
    Scales trimmed: a while-loop per leaf visit makes interpret mode
    much slower than the static all-rows loop."""

    def _case(self, rng, t=120, n=300):
        soup = _random_soup(rng, t)
        bvh = build_bvh(soup)
        packed = {k: jnp.asarray(v) for k, v in
                  tp2.pack_bvh2(bvh, soup).items()}
        ga = {k: jnp.asarray(v) for k, v in
              pack_gather_walk(bvh, leaf_tables(bvh, soup)).items()}
        o, d = _random_rays(rng, n)
        return packed, ga, o, d

    def test_matches_gather_walk(self, rng):
        packed, ga, o, d = self._case(rng)
        with pltpu.force_tpu_interpret_mode():
            got = tp2.intersect_pallas2(o, d, packed, leaf_mode="rows")
        want = intersect_bvh_packed(o, d, ga)
        _assert_hits_equal(got, want, "pallas2 rows-gated leaf")

    def test_any_hit_blocked_set(self, rng):
        packed, ga, o, d = self._case(rng)
        t_max = jnp.full((o.shape[0],), 2.0)
        with pltpu.force_tpu_interpret_mode():
            ai = tp2.intersect_pallas2(o, d, packed, any_hit=True,
                                       t_max=t_max, leaf_mode="rows")[0]
        wt = intersect_bvh_packed(o, d, ga)[1]
        assert ((np.asarray(ai) >= 0)
                == (np.asarray(wt) < 2.0)).all()
