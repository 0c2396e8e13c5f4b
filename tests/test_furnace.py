"""Analytic white-furnace oracle (VERDICT r1 #8: "analytic furnace test").

Scene: the closed Cornell room with EVERY wall made a Lambertian emitter
(emission E = 1) with albedo rho.  In such a cavity the equilibrium
radiance field is uniform and geometry-independent, and decomposes per
transport class k (number of path vertices) as

    L_k = E * rho^(k-2)          (k = 2: direct view of an emitter)

so the ratio of consecutive per-class unidirectional estimates must equal
rho everywhere, regardless of geometry, camera pose, or the sensor-to-
radiance constant.  This pins the entire bounce bookkeeping chain —
cosine-hemisphere pdf, BRDF*cos/pdf = rho throughput, tot_importance
threading, emission accounting — to an analytic value; no reference
implementation involved.

The only non-conforming geometry is the sensor plane (material 7, ~0.1%
of the cavity surface) — covered by the tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clive2_tpu.constants import MAX_BOUNCES
from clive2_tpu.integrator import trace as T
from clive2_tpu.materials import MaterialTable
from clive2_tpu.scene import create_scene

pytestmark = pytest.mark.slow  # 96-256 spp oracle (default gate skips; -m slow)

RHO = 0.7
W = H = 32
SPP = 96


def _furnace_scene():
    def make_all_emissive(soup):
        soup.is_light = ~soup.is_camera
        soup.material = np.where(soup.is_camera, 7, 6).astype(np.int32)
        return soup

    mats = MaterialTable.build(
        [dict(color=(RHO, RHO, RHO))] * 6
        + [dict(color=(RHO, RHO, RHO), emission=(1.0, 1.0, 1.0))]
        + [dict(color=(1.0, 1.0, 1.0))]          # slot 7: sensor plane
    )
    return create_scene(
        pixel_width=W, pixel_height=H,
        cam_center=np.array([0, 1.5, 6]),
        cam_direction=np.array([0, 0, -1]),
        materials=mats,
        soup_transform=make_all_emissive,
    )


def _per_class_sums(scene, spp):
    key = jax.random.key(11)

    def one(k):
        k_cam, k_trace = jax.random.split(k, 2)
        cam_rays, _ = T.generate_camera_rays(k_cam, scene.data["camera"],
                                             W, H)
        path = T.trace_subpaths(k_trace, cam_rays, scene.data,
                                from_camera=True)
        hit_light = path["vertices"]["hit_light"]    # [D, N]
        valid = path["valid"]
        mask = (valid & (hit_light >= 0)).astype(jnp.float32)
        color = path["vertices"]["color"]            # [D, N, 3]
        tot = path["vertices"]["tot_importance"]     # [D, N]
        d = color.shape[0]
        prior = jnp.concatenate(
            [jnp.ones_like(color[0:1]), color[: d - 1]], axis=0
        )
        est = prior.mean(axis=-1) / jnp.maximum(tot, 1e-30)  # [D, N]
        return jnp.sum(est * mask, axis=1)           # [D] per-class sums

    @jax.jit
    def step(i, acc):
        return acc + one(jax.random.fold_in(key, i))

    sums = jax.lax.fori_loop(0, spp, step, jnp.zeros((MAX_BOUNCES,)))
    return np.asarray(sums) / (spp * W * H)


@pytest.fixture(scope="module")
def class_means():
    return _per_class_sums(_furnace_scene(), SPP)


def test_furnace_direct_class_is_uniform_emission(class_means):
    # index d holds class d+1 (vertex d is the emitting vertex); vertex 0
    # is the sensor-plane origin, so index 0 must be exactly zero and
    # index 1 (class 2: every pixel sees an emitter directly) positive.
    assert class_means[0] == 0
    assert class_means[1] > 0


def test_furnace_class_ratios_equal_albedo(class_means):
    ratios = class_means[2:] / class_means[1:-1]
    assert np.all(np.abs(ratios - RHO) < 0.02), (
        f"per-class ratios {ratios} deviate from rho={RHO}"
    )


# ---------------------------------------------------------------------------
# Glass furnace: a colorless dielectric in a black-walled emissive cavity
# is INVISIBLE (round-2 review item #3: a furnace variant where the
# specular transmit/reflect machinery actually runs).
#
# Walls: emission E = 1, albedo 0 (pure emitters — every path terminates
# at its first wall hit with radiance exactly E).  Object: a glass sphere
# with color (1,1,1), so each interface splits Fresnel-weighted into
# reflect/transmit with R + T = 1 and carries throughput exactly 1 along
# the sampled branch (trace.metal:475-479 dispatch; degreve_fresnel TIR
# -> 1).  Therefore EVERY pixel — through the glass or not — converges to
# E, pinning the Fresnel energy closure, the ingress/egress color rules,
# and the specular pdf bookkeeping to an analytic value.  The only
# residual is depth truncation: a path still inside the glass after
# MAX_BOUNCES vertices (deep TIR chains) contributes nothing.
# ---------------------------------------------------------------------------


def _glass_furnace_scene():
    from clive2_tpu.geometry import TriangleSoup
    from clive2_tpu.models import icosphere

    def make_walls_emissive(soup):
        is_glass = soup.material == 0        # walls use slots 1-4 + 6
        soup.is_light = ~soup.is_camera & ~is_glass
        soup.material = np.where(
            soup.is_camera, 7, np.where(is_glass, 0, 6)
        ).astype(np.int32)
        return soup

    mats = MaterialTable.build(
        [dict(color=(1.0, 1.0, 1.0), type=1, ior=1.5)]    # 0: clear glass
        + [dict(color=(0.0, 0.0, 0.0))] * 5
        + [dict(color=(0.0, 0.0, 0.0), emission=(1.0, 1.0, 1.0))]  # 6: walls
        + [dict(color=(1.0, 1.0, 1.0))]                   # 7: sensor
    )
    v, f = icosphere(1)
    soup = TriangleSoup.from_vertices(
        (v[f] * 1.5 + np.array([0.0, 1.5, 1.5])).astype(np.float32),
        material=0,
    )
    return create_scene(
        pixel_width=W, pixel_height=H,
        cam_center=np.array([0, 1.5, 6]),
        cam_direction=np.array([0, 0, -1]),
        materials=mats,
        extra_geometry=soup,
        soup_transform=make_walls_emissive,
    )


@pytest.fixture(scope="module")
def glass_furnace_image():
    scene = _glass_furnace_scene()
    key = jax.random.key(5)

    def one(k):
        k_cam, k_trace = jax.random.split(k, 2)
        cam_rays, _ = T.generate_camera_rays(k_cam, scene.data["camera"],
                                             W, H)
        # depth 12 (vs the default 6) lets deep TIR chains inside the
        # faceted sphere reach a wall, shrinking truncation loss from
        # ~11% of the glass disc to a few percent — the oracle stays
        # sharp without loosening its bounds.
        path = T.trace_subpaths(k_trace, cam_rays, scene.data,
                                from_camera=True, max_bounces=12)
        return T.unidirectional_image(path, all_hits=True).reshape(H, W, 3)

    @jax.jit
    def step(i, acc):
        return acc + one(jax.random.fold_in(key, i))

    img = jax.lax.fori_loop(0, SPP, step, jnp.zeros((H, W, 3)))
    return np.asarray(img) / SPP


def test_glass_furnace_sphere_is_invisible(glass_furnace_image):
    """Every pixel sees radiance E=1; the glass redistributes but cannot
    create or destroy energy (R + T = 1, color 1).  Truncated deep-TIR
    chains lose a little energy, never gain."""
    lum = glass_furnace_image.mean(axis=-1)
    assert abs(lum.mean() - 1.0) < 0.02, f"mean {lum.mean():.4f}"
    # nothing may EXCEED the furnace value (beyond noise); losses bounded.
    # A path still inside the glass when the depth-12 budget runs out
    # contributes 0 — never negative, never excess.
    assert lum.max() < 1.05, f"max {lum.max():.4f}"
    # worst pixel at depth 12 measures 0.78: a grazing silhouette ray can
    # still enter near the critical angle and TIR >10 times inside the
    # flat-faceted icosphere; truncation only ever LOSES energy.
    assert lum.min() > 0.70, f"min {lum.min():.4f} (deep-TIR truncation)"
    # the sphere's disc must not differ from the background by more than
    # truncation: compare center patch (through glass) to corner patch
    c = lum[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean()
    bg = lum[:6, :6].mean()
    assert abs(c - bg) < 0.08, f"center {c:.4f} vs background {bg:.4f}"
