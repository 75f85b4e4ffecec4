"""Patch extraction (the TPU equivalent of the reference's grid_sample-based
extract_glimpse, reference: utils/extract_glimpse.py:7-79).

The reference always calls it with mode='nearest', normalized=False,
centered=False, padding_mode='zeros' (reference: models/sampler.py:171-178,
284-291). Under grid_sample's align_corners=False convention that reduces to
an integer gather of rows/cols `c - S//2 + k, k in [0, S)` around the
(integer) centre, with zeros outside the image. We implement exactly that as
a clamped gather + in-bounds mask — static shapes, fully batchable, no
scatter/gather over normalised float grids.
"""
from __future__ import annotations

import jax.numpy as jnp


def patch_grid(centers_yx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Integer pixel grid of each patch.

    centers_yx: (..., 2) int32 -> (..., S, S, 2); rows c - S//2 .. c + S//2 - 1
    (matches reference sampler.py:275-280 and the extract_glimpse gather).
    """
    offs = jnp.arange(size, dtype=centers_yx.dtype) - size // 2
    gy = centers_yx[..., None, None, 0] + offs[:, None]
    gx = centers_yx[..., None, None, 1] + offs[None, :]
    return jnp.stack([jnp.broadcast_to(gy, gy.shape[:-2] + (size, size)),
                      jnp.broadcast_to(gx, gx.shape[:-2] + (size, size))], axis=-1)


def extract_patches(img: jnp.ndarray, centers_yx: jnp.ndarray,
                    size: int) -> jnp.ndarray:
    """Gather SxS patches with zero padding outside the image.

    img: (H, W, C); centers_yx: (..., 2) integer centres ->
    (..., S, S, C).
    """
    h, w = img.shape[:2]
    grid = patch_grid(centers_yx.astype(jnp.int32), size)
    gy, gx = grid[..., 0], grid[..., 1]
    inb = ((gy >= 0) & (gy < h) & (gx >= 0) & (gx < w))
    vals = img[jnp.clip(gy, 0, h - 1), jnp.clip(gx, 0, w - 1)]
    return vals * inb[..., None].astype(img.dtype)


def summed_area_table(x: jnp.ndarray) -> jnp.ndarray:
    """SAT with a leading zero row/col: sat[i, j] = sum(x[:i, :j])."""
    s = jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def window_sum(sat: jnp.ndarray, centers_yx: jnp.ndarray,
               size: int) -> jnp.ndarray:
    """Sum of the table's underlying array over each patch window
    (same window convention as extract_patches), clipped at the borders.

    sat: (H+1, W+1) from summed_area_table; centers_yx: (..., 2) ->
    (...,) sums over rows [c - S//2, c + S//2) intersected with the image.
    """
    h = sat.shape[0] - 1
    w = sat.shape[1] - 1
    c = centers_yx.astype(jnp.int32)
    y0 = jnp.clip(c[..., 0] - size // 2, 0, h)
    y1 = jnp.clip(c[..., 0] - size // 2 + size, 0, h)
    x0 = jnp.clip(c[..., 1] - size // 2, 0, w)
    x1 = jnp.clip(c[..., 1] - size // 2 + size, 0, w)
    return sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]
