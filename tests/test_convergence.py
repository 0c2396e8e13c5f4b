"""Per-pixel BDPT-vs-unidirectional convergence oracle (VERDICT r1 #8).

The round-1 oracle compared only TOTAL energy (±15% band) — a MIS-weight
bug that redistributes energy spatially would pass it.  This test renders
a 64x64 Cornell at 256 spp and compares the COUNT-NORMALIZED BDPT and
unidirectional images per 8x8 pixel block: both estimators target the same
integral, so converged blocks must agree everywhere, not just in sum.

History (round 2): this oracle exposed that the reference estimator (and
our round-1 transcription of it) disagrees with the unidirectional image
by 0.28x-10.9x per block (globally 0.99 by near-cancellation!).  The
corrected estimator (constants.py:REFERENCE_MIS docstring lists the fixes:
junction pdf overrides, true single-cosine pdf-ratio chains, emission
cosine, diffuse-BRDF junction terms, sensor-plane splat Jacobian, robust
grazing visibility) brings every block into [0.95, 1.35].  The first test
locks that in as a regression bound; the second records the remaining gap
to the strict 12% target (residual inconsistency in the >=4-vertex class
weights, still under investigation).

Reference analog: the unidirectional image is the reference's own implicit
cross-check (trace.metal:523-528, renderer.py:309-316); SURVEY §4 lists
this as the integrator oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clive2_tpu as c2
from clive2_tpu.integrator.render import render_sample


def _block_images(spp=256, w=64, h=64):
    scene = c2.create_scene_from_preset("empty", pixel_width=w,
                                        pixel_height=h)
    key = jax.random.key(123)

    @jax.jit
    def step(i, acc):
        out = render_sample(jax.random.fold_in(key, i), scene.data, w, h)
        return dict(
            contrib=acc["contrib"] + out["image"],
            uni=acc["uni"] + out["unidirectional"],
        )

    acc = dict(contrib=jnp.zeros((h, w, 3)), uni=jnp.zeros((h, w, 3)))
    acc = jax.lax.fori_loop(0, spp, step, acc)
    # count-normalized comparison: out["image"] is the raw MIS-weighted
    # contribution sum (incl. splats) whose expectation IS the pixel value
    bdpt = np.asarray(acc["contrib"] / spp)
    uni = np.asarray(acc["uni"] / spp)
    blk = lambda im: im.reshape(h // 8, 8, w // 8, 8, 3).mean(axis=(1, 3))
    return blk(bdpt), blk(uni)


@pytest.fixture(scope="module")
def blocks():
    return _block_images()


def test_bdpt_matches_unidirectional_per_block(blocks):
    b_b, b_u = blocks
    scale = b_u.mean()
    assert scale > 0
    rel = np.abs(b_b - b_u) / (0.5 * (b_b + b_u) + 0.05 * scale)
    # regression bound at the corrected estimator's achieved agreement;
    # the reference estimator fails this at rel.max() ~ 1.8
    assert rel.max() < 0.45, (
        f"max block deviation {rel.max():.3f} at "
        f"{np.unravel_index(rel.argmax(), rel.shape)}"
    )
    assert abs(b_b.mean() / b_u.mean() - 1.0) < 0.10


@pytest.mark.xfail(
    strict=False,
    reason="target bound: residual ~1.1-1.3x excess in blocks dominated by "
    "4+-vertex transport (higher-class MIS weight consistency), under "
    "investigation",
)
def test_bdpt_matches_unidirectional_per_block_strict(blocks):
    b_b, b_u = blocks
    scale = b_u.mean()
    rel = np.abs(b_b - b_u) / (0.5 * (b_b + b_u) + 0.05 * scale)
    assert rel.max() < 0.12
    assert abs(b_b.mean() / b_u.mean() - 1.0) < 0.03
