"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The reference is single-device (SURVEY §2.3); these tests validate the
TPU build's first-class data-parallel path: the pixel wavefront sharded
over a "tiles" mesh axis, BVH/material tables replicated, splat scatter
and filter halos handled by GSPMD collectives.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import clive2_tpu as c2
from clive2_tpu.integrator.render import make_sharded_render, render_sample_jit


@pytest.fixture(scope="module")
def scene_64():
    return c2.create_scene_from_preset("empty", pixel_width=64, pixel_height=16)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(scene_64):
    w, h = 64, 16
    mesh = Mesh(np.array(jax.devices()), ("tiles",))
    step = make_sharded_render(mesh, w, h)
    key = jax.random.key(11)
    sharded = step(key, scene_64.data)
    single = render_sample_jit(key, scene_64.data, w, h)
    np.testing.assert_allclose(
        np.asarray(sharded["image"]), np.asarray(single["image"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded["weight"]), np.asarray(single["weight"]),
        rtol=1e-4, atol=1e-6,
    )


def test_sharded_renderer_end_to_end(scene_64):
    mesh = Mesh(np.array(jax.devices()), ("tiles",))
    r = c2.Renderer(scene_64, seed=4, mesh=mesh)
    r.run_sample()
    r.run_sample()
    raw = r.raw_image
    assert np.isfinite(raw).all()
    assert raw.sum() > 0
