"""TPU-friendly row gathers.

XLA's dynamic gather lowers poorly on TPU for small row sizes (measured
~13ms for a 262k-row gather of 24-float rows on v5e — memory-latency bound).
For small tables the idiomatic TPU trick is a one-hot matmul: build
``onehot(idx) @ table`` and let the MXU do the "gather".  Exact for values
representable in f32 (all our attribute tables are small ints/floats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# tables with at most this many rows go through the MXU one-hot path
ONEHOT_MAX_ROWS = 512


def gather_rows(table, idx):
    """table [T, ...] gathered at idx [N] -> [N, ...].

    Uses a one-hot matmul for small T (MXU), ``jnp.take`` otherwise.
    Integer tables round-trip exactly (values << 2^24).
    """
    t = table.shape[0]
    if t > ONEHOT_MAX_ROWS:
        return jnp.take(table, idx, axis=0)
    flat = table.reshape(t, -1)
    onehot = jax.nn.one_hot(idx, t, dtype=jnp.float32)
    out = onehot @ flat.astype(jnp.float32)
    out = out.reshape((idx.shape[0],) + table.shape[1:])
    if jnp.issubdtype(table.dtype, jnp.integer) or table.dtype == jnp.bool_:
        out = jnp.round(out).astype(table.dtype)
    return out


def select_along_axis1(values, k):
    """values [N, C] at column k [N] -> [N], via one-hot dot (avoids the
    slow row-gather ``values[rows, k]`` pattern on TPU)."""
    c = values.shape[1]
    onehot = jax.nn.one_hot(k, c, dtype=values.dtype if values.dtype in
                            (jnp.float32, jnp.bfloat16) else jnp.float32)
    out = jnp.sum(values.astype(onehot.dtype) * onehot, axis=1)
    return out.astype(values.dtype) if values.dtype != out.dtype else out
