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
