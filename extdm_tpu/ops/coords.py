"""Coordinate-grid utilities for flow-based warping.

Semantics match the reference LFAE helpers (see
/root/reference/model/LFAE/util.py:22-66,274-289) but are written
NHWC / channels-last and shape-static so XLA can constant-fold the grids.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid of (x, y) coordinates spanning [-1, 1] x [-1, 1].

    Channel 0 is x (varies along width), channel 1 is y (varies along
    height) — the `grid_sample` convention.
    """
    x = np.linspace(-1.0, 1.0, w) if w > 1 else np.zeros((1,))
    y = np.linspace(-1.0, 1.0, h) if h > 1 else np.zeros((1,))
    xx, yy = np.meshgrid(x, y)  # each (h, w)
    grid = np.stack([xx, yy], axis=-1)
    return jnp.asarray(grid, dtype=dtype)


def region2gaussian(center: jnp.ndarray, covar, spatial_size) -> jnp.ndarray:
    """Render per-region Gaussian heatmaps.

    center: (..., 2) region means in [-1, 1] (x, y).
    covar: either a python float (isotropic variance) or (..., 2, 2)
      covariance matrices.
    spatial_size: (h, w).

    Returns (..., h, w).
    """
    h, w = spatial_size
    grid = make_coordinate_grid(h, w, dtype=center.dtype)  # (h, w, 2)
    lead = center.shape[:-1]
    grid = jnp.reshape(grid, (1,) * len(lead) + (h, w, 2))
    mean = jnp.reshape(center, lead + (1, 1, 2))
    diff = grid - mean  # (..., h, w, 2)
    if isinstance(covar, (float, int)):
        return jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1) / covar)
    covar_inv = jnp.linalg.inv(covar)  # (..., 2, 2); closed form 2x2 inside XLA
    covar_inv = jnp.reshape(covar_inv, lead + (1, 1, 2, 2))
    # under_exp = diff^T C^{-1} diff
    tmp = jnp.einsum("...i,...ij->...j", diff, covar_inv)
    under = jnp.einsum("...j,...j->...", tmp, diff)
    return jnp.exp(-0.5 * under)


def to_homogeneous(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) -> (..., 3) by appending ones."""
    ones = jnp.ones(coords.shape[:-1] + (1,), dtype=coords.dtype)
    return jnp.concatenate([coords, ones], axis=-1)


def from_homogeneous(coords: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """(..., 3) -> (..., 2), dividing by the homogeneous coordinate."""
    return coords[..., :2] / (coords[..., 2:3] + eps)
