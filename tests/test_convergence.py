"""Per-pixel BDPT-vs-unidirectional convergence oracle (VERDICT r1 #8).

The round-1 oracle compared only TOTAL energy (±15% band) — a MIS-weight
bug that redistributes energy spatially would pass it.  These tests compare
the COUNT-NORMALIZED BDPT and unidirectional (BSDF-sampled) estimates per
8x8 pixel block on a 64x64 Cornell at 256 spp.

Two subtleties make a naive total-vs-total comparison systematically off,
both diagnosed with scripts/diag_mis.py (round 2):

  1. the reference's unidirectional scan breaks at the FIRST light hit
     (trace.metal:523-528), dropping transport whose intermediate vertices
     lie on the emitter surface (~13% of class-4+ energy on Cornell).  The
     oracle uses unidirectional_image(all_hits=True), which accumulates
     every light-hit vertex — the same integral BDPT targets.
  2. with camera subpaths capped at MAX_BOUNCES=6 vertices, the
     unidirectional estimator reaches only transport classes k = t <= 6,
     while BDPT strategies cover k = t+s up to 12.  The strict test
     therefore compares CLASS-LIMITED sums (k <= 6 on both sides) built
     from connect_paths(debug_per_strategy=True); the totals test bounds
     the known BDPT-only extra-class energy instead (~4-5% global).

With the corrected estimator (constants.py:REFERENCE_MIS docstring) every
per-strategy unweighted estimate agrees with its class oracle to <1.5% and
the weighted class sums to <1% (diag_mis at 200 spp).  The reference
estimator fails the strict test at rel.max() ~ 1.8.

Reference analog: the unidirectional image is the reference's own implicit
cross-check (trace.metal:523-528, renderer.py:309-316); SURVEY §4 lists
this as the integrator oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clive2_tpu as c2
from clive2_tpu.constants import MAX_BOUNCES
from clive2_tpu.integrator import trace as T
from clive2_tpu.integrator.connect import connect_paths
from clive2_tpu.integrator.render import render_sample

pytestmark = pytest.mark.slow  # 96-256 spp oracle (default gate skips; -m slow)

W = H = 64
SPP = 256
BLK = 8


def _one_sample(key, scene_data):
    """One BDPT sample with per-strategy debug images + all-hits uni."""
    cam = scene_data["camera"]
    k_cam, k_light, k_trace = jax.random.split(key, 3)
    cam_rays, _ = T.generate_camera_rays(k_cam, cam, W, H)
    light_rays = T.generate_light_rays(
        k_light, scene_data["lights"], scene_data["mat"], W * H
    )
    n = W * H
    merged = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), cam_rays, light_rays
    )
    fc = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((n,), bool)])
    path = T.trace_subpaths(k_trace, merged, scene_data, from_camera=fc)
    half = lambda tree, sl: jax.tree.map(lambda a: a[:, sl], tree)
    cam_path = dict(
        vertices=half(path["vertices"], slice(0, n)),
        valid=path["valid"][:, :n], length=path["length"][:n],
    )
    light_path = dict(
        vertices=half(path["vertices"], slice(n, 2 * n)),
        valid=path["valid"][:, n:], length=path["length"][n:],
    )
    conn = connect_paths(cam_path, light_path, scene_data, W, H,
                         debug_per_strategy=True)
    uni_all = T.unidirectional_image(cam_path, all_hits=True).reshape(H, W, 3)

    limited = jnp.zeros((H, W, 3))
    total = jnp.zeros((H, W, 3))
    for (t, s), d in conn["per_strategy"].items():
        total = total + d["weighted"]
        if t + s <= MAX_BOUNCES:
            limited = limited + d["weighted"]
    return dict(limited=limited, total=total, uni=uni_all)


@pytest.fixture(scope="module")
def images():
    scene = c2.create_scene_from_preset("empty", pixel_width=W,
                                        pixel_height=H)
    key = jax.random.key(123)

    @jax.jit
    def step(i, acc):
        out = _one_sample(jax.random.fold_in(key, i), scene.data)
        return jax.tree.map(lambda a, b: a + b, acc, out)

    acc = dict(limited=jnp.zeros((H, W, 3)), total=jnp.zeros((H, W, 3)),
               uni=jnp.zeros((H, W, 3)))
    acc = jax.lax.fori_loop(0, SPP, step, acc)
    return jax.tree.map(lambda a: np.asarray(a) / SPP, acc)


def _blocks(im):
    return im.reshape(H // BLK, BLK, W // BLK, BLK, 3).mean(axis=(1, 3))


def test_bdpt_class_limited_matches_unidirectional_strict(images):
    """Strict per-block oracle: same transport classes on both sides."""
    b_b, b_u = _blocks(images["limited"]), _blocks(images["uni"])
    scale = b_u.mean()
    assert scale > 0
    rel = np.abs(b_b - b_u) / (0.5 * (b_b + b_u) + 0.05 * scale)
    assert rel.max() < 0.12, (
        f"max block deviation {rel.max():.3f} at "
        f"{np.unravel_index(rel.argmax(), rel.shape)}"
    )
    assert abs(b_b.mean() / b_u.mean() - 1.0) < 0.03


def test_bdpt_total_vs_unidirectional_regression(images):
    """Totals: BDPT additionally carries class-7..12 transport the depth-6
    unidirectional estimator cannot reach — bound it instead of hiding it."""
    b_b, b_u = _blocks(images["total"]), _blocks(images["uni"])
    ratio = b_b.mean() / b_u.mean()
    assert 1.00 <= ratio < 1.12, f"global ratio {ratio:.4f}"
    scale = b_u.mean()
    rel = (b_b - b_u) / (0.5 * (b_b + b_u) + 0.05 * scale)
    # extra-class energy is nonnegative everywhere; noise bound below
    assert rel.min() > -0.12
    assert rel.max() < 0.30
