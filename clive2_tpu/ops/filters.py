"""3x3 Gaussian reconstruction filter.

Rebuild of the reference's WeightAggregator machinery: per-sample filter
weights (trace.metal:827-864) and the neighbor gather
``adaptive_finalize_samples`` (trace.metal:981-1018).  The gather of
transposed neighbor weights becomes nine shifted adds over the image —
no scatter, no bins (the reference's "adaptive" bin indirection is identity
in practice, renderer.py:92).
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import dot


def filter_weights(sensor_pos, pixel_idx, cam, width: int, height: int):
    """Per-sample normalized 3x3 Gaussian weights (trace.metal:827-862).

    sensor_pos: [N, 3] exact (jittered) sample position on the sensor plane
    pixel_idx:  [N] i32 flat pixel index (y * width + x)
    cam: camera pytree (camera.Camera.to_pytree())
    Returns weights [N, 3, 3]; index [a, b] is the weight toward pixel
    (x + a - 1, y + b - 1); out-of-bounds neighbors get 0; rows sum to 1.
    """
    pw = cam["phys_width"]
    ph = cam["phys_height"]
    pixel_w = pw / width
    pixel_h = ph / height
    sigma = 0.5 * jnp.sqrt(pixel_w * pixel_w + pixel_h * pixel_h)

    px = pixel_idx % width
    py = pixel_idx // width

    offs = jnp.arange(-1, 2)
    nx = px[:, None, None] + offs[None, :, None]     # [N, 3, 1]
    ny = py[:, None, None] + offs[None, None, :]     # [N, 1, 3]
    in_bounds = (nx >= 0) & (nx < width) & (ny >= 0) & (ny < height)

    # pixel centers (trace.metal:551-562)
    xn = (nx - 0.5 * width) / width
    yn = (ny - 0.5 * height) / height
    centers = (
        cam["center"][None, None, None, :]
        + (xn * pw)[..., None] * cam["dx"][None, None, None, :]
        + (yn * ph)[..., None] * cam["dy"][None, None, None, :]
    )  # [N, 3, 3, 3]

    d = centers - sensor_pos[:, None, None, :]
    dist2 = dot(d, d)
    w = jnp.exp(-dist2 / (2.0 * sigma * sigma))
    w = jnp.where(in_bounds, w, 0.0)
    wsum = jnp.sum(w, axis=(1, 2), keepdims=True)
    return jnp.where(wsum > 0.0, w / wsum, 0.0)


def finalize_samples(contribution, weights, contrib_weight_sum,
                     width: int, height: int, row0=None, rows: int = None):
    """Filtered image + per-pixel weight sums (trace.metal:981-1018).

    contribution:       [N, 3]  per-pixel-sample BDPT contribution
    weights:            [N, 3, 3] from :func:`filter_weights`
    contrib_weight_sum: [N]     sum of MIS weights accumulated per sample
    row0, rows:         when set, the samples cover only image rows
                        [row0, row0+rows) (chunked rendering); the filter's
                        one-row spill across the stripe boundary is placed
                        correctly in the full-size output.

    Returns (image [H, W, 3], weight_image [H, W]).  Implements the
    reference's transposed-weight neighbor gather
    (``weights[1-i][1-j]``, trace.metal:1009) as nine shifted adds.
    """
    local_rows = height if rows is None else rows
    c = contribution.reshape(local_rows, width, 3)
    w = weights.reshape(local_rows, width, 3, 3)
    cws = contrib_weight_sum.reshape(local_rows, width)

    # accumulate on a canvas with one spill row above and below: a sample at
    # local row r contributes to output row r - j = canvas row r - j + 1
    image = jnp.zeros((local_rows + 2, width, 3), dtype=c.dtype)
    wimage = jnp.zeros((local_rows + 2, width), dtype=c.dtype)
    for i in (-1, 0, 1):          # x offset
        for j in (-1, 0, 1):      # y offset
            # For output pixel p, the neighbor sample sits at q = p + (i, j)
            # and contributes with its weight toward q + (-i, -j) = p, which
            # is its weights[1 - i][1 - j].
            wv = w[:, :, 1 - i, 1 - j]
            val = _shiftx(wv[..., None] * c, i)
            wval = _shiftx(wv * cws, i)
            image = image.at[1 - j : 1 - j + local_rows].add(val)
            wimage = wimage.at[1 - j : 1 - j + local_rows].add(wval)

    if rows is None:
        return image[1:-1], wimage[1:-1]
    # place the (rows+2) canvas into the full image: canvas row 0 is global
    # row row0-1, i.e. padded-canvas row row0 (no border clamping needed)
    import jax

    full_i = jnp.zeros((height + 2, width, 3), dtype=c.dtype)
    full_w = jnp.zeros((height + 2, width), dtype=c.dtype)
    row0 = jnp.asarray(row0, jnp.int32)
    full_i = jax.lax.dynamic_update_slice(full_i, image,
                                          (row0, jnp.int32(0), jnp.int32(0)))
    full_w = jax.lax.dynamic_update_slice(full_w, wimage,
                                          (row0, jnp.int32(0)))
    return full_i[1:-1], full_w[1:-1]


def finalize_samples_scatter(contribution, weights, contrib_weight_sum,
                             pixel_idx, width: int, height: int):
    """Scatter-based variant of :func:`finalize_samples` for samples over an
    ARBITRARY pixel subset (adaptive sampling): each sample splats its nine
    filter-weighted contributions with one flat per-channel scatter-add.

    contribution [M, 3]; weights [M, 3, 3]; contrib_weight_sum [M];
    pixel_idx [M] flat indices.  Returns (image [H, W, 3], weight [H, W]).
    """
    import jax

    px = pixel_idx % width
    py = pixel_idx // width
    offs = jnp.arange(-1, 2)
    nx = px[:, None, None] + offs[None, :, None]      # [M, 3, 1]
    ny = py[:, None, None] + offs[None, None, :]      # [M, 1, 3]
    ok = (nx >= 0) & (nx < width) & (ny >= 0) & (ny < height)
    tgt = jnp.where(ok, ny * width + nx, width * height)   # OOB -> dropped
    tgt = tgt.reshape(-1)                             # [M * 9]

    vals = (weights[..., None] * contribution[:, None, None, :]).reshape(-1, 3)
    wsum = (weights * contrib_weight_sum[:, None, None]).reshape(-1)

    tgt, v0, v1, v2, wsum = jax.lax.optimization_barrier(
        (tgt, vals[:, 0], vals[:, 1], vals[:, 2], wsum)
    )
    flat = lambda v: (
        jnp.zeros((width * height,), jnp.float32).at[tgt].add(v, mode="drop")
    )
    image = jnp.stack([flat(v0), flat(v1), flat(v2)], axis=-1)
    return (image.reshape(height, width, 3),
            flat(wsum).reshape(height, width))


def _shiftx(a, dx: int):
    """out[y, x] = a[y, x + dx], zero-padded at the x borders."""
    wd = a.shape[1]
    pad = [(0, 0), (1, 1)] + [(0, 0)] * (a.ndim - 2)
    ap = jnp.pad(a, pad)
    return ap[:, 1 + dx : 1 + dx + wd]
