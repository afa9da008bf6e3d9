"""Differentiable image interpolation helpers."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def interp_image_centered(image, x, y):
    """Bilinear interpolation of a centered image at physical pixel
    coordinates (x, y) where (0, 0) is the image center, x indexes
    columns and y indexes rows. Out-of-bounds positions return NaN-free
    edge values clamped, so callers should range-check if needed.
    """
    ny, nx = image.shape
    col = x + (nx - 1) / 2.0
    row = y + (ny - 1) / 2.0
    inside = (col >= 0) & (col <= nx - 1) & (row >= 0) & (row <= ny - 1)
    val = map_coordinates(image, [jnp.atleast_1d(row), jnp.atleast_1d(col)], order=1, mode="nearest")
    val = jnp.reshape(val, jnp.shape(x)) if jnp.ndim(x) else val[0]
    return jnp.where(inside, val, jnp.nan)
