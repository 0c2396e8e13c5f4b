"""Native (C++) BVH builder equivalence tests.

The native builder (csrc/bvh_builder.cpp) must produce trees identical to
the numpy reference implementation.  Skipped if libclive2.so isn't built
(`make -C csrc`).
"""

import numpy as np
import pytest

from clive2_tpu.bvh import build_bvh, native
from clive2_tpu.geometry import TriangleSoup

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libclive2.so not built (make -C csrc)"
)


def make_soup(rng, n):
    base = rng.uniform(-10, 10, size=(n, 1, 3))
    return TriangleSoup.from_vertices(
        (base + rng.normal(size=(n, 3, 3))).astype(np.float32)
    )


@pytest.mark.parametrize("n", [1, 7, 8, 9, 100, 1000])
def test_native_matches_python(rng, n):
    soup = make_soup(rng, n)
    a = build_bvh(soup, use_native=False)
    b = build_bvh(soup, use_native=True)
    assert a.n_nodes == b.n_nodes
    assert a.n_leaves == b.n_leaves
    np.testing.assert_array_equal(a.miss, b.miss)
    np.testing.assert_array_equal(a.right_child, b.right_child)
    np.testing.assert_array_equal(a.leaf_id, b.leaf_id)
    np.testing.assert_array_equal(a.tri_start, b.tri_start)
    np.testing.assert_array_equal(a.tri_count, b.tri_count)
    np.testing.assert_array_equal(a.permutation, b.permutation)
    np.testing.assert_allclose(a.node_mins, b.node_mins, rtol=1e-6)
    np.testing.assert_allclose(a.node_maxes, b.node_maxes, rtol=1e-6)


def test_native_permutation_is_permutation(rng):
    soup = make_soup(rng, 5000)
    b = build_bvh(soup, use_native=True)
    assert sorted(b.permutation.tolist()) == list(range(5000))
