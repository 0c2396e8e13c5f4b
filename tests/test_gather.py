"""gather_rows / select_along_axis1 exactness (VERDICT r1 weak #7).

The one-hot-matmul gather is exact only while table values survive the
f32 round-trip (ints < 2^24); these tests pin that edge, the bool/int
dtype paths, and the ONEHOT_MAX_ROWS switchover to jnp.take.
"""

import jax.numpy as jnp
import numpy as np

from clive2_tpu.ops.gather import (
    ONEHOT_MAX_ROWS,
    gather_rows,
    select_along_axis1,
)


def test_int_roundtrip_exact_below_2_24():
    rng = np.random.default_rng(0)
    # values right up to the f32-exact integer ceiling
    table = jnp.asarray(
        rng.integers(0, 2**24 - 1, size=(64, 3), dtype=np.int64).astype(
            np.int32
        )
    )
    idx = jnp.asarray(rng.integers(0, 64, size=500), jnp.int32)
    out = gather_rows(table, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(idx)]
    )
    assert out.dtype == table.dtype


def test_bool_table():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.random((16,)) < 0.5)
    idx = jnp.asarray(rng.integers(0, 16, size=200), jnp.int32)
    out = gather_rows(table, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(idx)]
    )


def test_onehot_take_switchover_agree():
    """Tables above ONEHOT_MAX_ROWS switch to jnp.take — both paths must
    agree on the same data."""
    rng = np.random.default_rng(2)
    big = rng.normal(size=(ONEHOT_MAX_ROWS + 1, 4)).astype(np.float32)
    small = big[:ONEHOT_MAX_ROWS]
    idx = rng.integers(0, ONEHOT_MAX_ROWS, size=300)
    out_take = gather_rows(jnp.asarray(big), jnp.asarray(idx))
    out_mxu = gather_rows(jnp.asarray(small), jnp.asarray(idx))
    np.testing.assert_allclose(
        np.asarray(out_take), np.asarray(out_mxu), rtol=0, atol=0
    )
    np.testing.assert_allclose(np.asarray(out_mxu), small[idx], rtol=0,
                               atol=0)


def test_multi_dim_rows():
    rng = np.random.default_rng(3)
    table = rng.normal(size=(9, 3, 3)).astype(np.float32)
    idx = rng.integers(0, 9, size=77)
    out = gather_rows(jnp.asarray(table), jnp.asarray(idx))
    assert out.shape == (77, 3, 3)
    np.testing.assert_allclose(np.asarray(out), table[idx], rtol=0, atol=0)


def test_select_along_axis1():
    rng = np.random.default_rng(4)
    vals = rng.normal(size=(120, 7)).astype(np.float32)
    k = rng.integers(0, 7, size=120)
    out = select_along_axis1(jnp.asarray(vals), jnp.asarray(k))
    np.testing.assert_allclose(
        np.asarray(out), vals[np.arange(120), k], rtol=1e-6, atol=1e-6
    )
