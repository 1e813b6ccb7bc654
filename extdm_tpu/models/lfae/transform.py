"""Random thin-plate-spline transform for equivariance losses.

Functional re-design of /root/reference/model/LFAE/model.py:82-134: the
transform is a pytree of sampled parameters; `warp_coordinates`,
`transform_frame`, and `jacobian` are pure functions, so the whole
equivariance loss lives inside one jitted train step. The coordinate
jacobian uses forward-mode autodiff (jax.jvp) instead of torch's
double-backward `grad` trick.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from extdm_tpu.ops.coords import make_coordinate_grid
from extdm_tpu.ops.warp import grid_sample


class TPSTransform(NamedTuple):
    theta: jnp.ndarray  # (B, 2, 3) affine
    control_points: jnp.ndarray | None  # (P*P, 2)
    control_params: jnp.ndarray | None  # (B, 1, P*P)


def random_tps(key, batch: int, sigma_affine: float, sigma_tps: float | None = None,
               points_tps: int | None = None) -> TPSTransform:
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (batch, 2, 3)) * sigma_affine
    theta = noise + jnp.eye(2, 3)[None]
    if sigma_tps is not None and points_tps is not None:
        cp = make_coordinate_grid(points_tps, points_tps).reshape(-1, 2)
        params = jax.random.normal(k2, (batch, 1, points_tps**2)) * sigma_tps
        return TPSTransform(theta, cp, params)
    return TPSTransform(theta, None, None)


def warp_coordinates(t: TPSTransform, coords: jnp.ndarray) -> jnp.ndarray:
    """coords: (B, N, 2) -> (B, N, 2)."""
    theta = t.theta.astype(coords.dtype)
    out = jnp.einsum("bij,bnj->bni", theta[:, :, :2], coords) + theta[:, None, :, 2]
    if t.control_points is not None:
        cp = t.control_points.astype(coords.dtype)  # (P2, 2)
        dist = jnp.abs(coords[:, :, None, :] - cp[None, None]).sum(-1)  # (B, N, P2)
        rbf = dist**2 * jnp.log(dist + 1e-6)
        res = (rbf * t.control_params.astype(coords.dtype)).sum(-1, keepdims=True)  # (B, N, 1)
        out = out + res
    return out


def transform_frame(t: TPSTransform, frame: jnp.ndarray) -> jnp.ndarray:
    """frame: (B, H, W, C) warped by the inverse-sampled grid (ref :102-106)."""
    B, H, W, C = frame.shape
    grid = make_coordinate_grid(H, W, dtype=frame.dtype).reshape(1, H * W, 2)
    grid = jnp.broadcast_to(grid, (B, H * W, 2))
    warped = warp_coordinates(t, grid).reshape(B, H, W, 2)
    return grid_sample(frame, warped, padding_mode="reflection")


def jacobian(t: TPSTransform, coords: jnp.ndarray) -> jnp.ndarray:
    """d warp / d coords at each point: (B, N, 2, 2) via two jvp passes."""

    def f(c):
        return warp_coordinates(t, c)

    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0], coords.dtype), coords.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0], coords.dtype), coords.shape)
    _, dx = jax.jvp(f, (coords,), (ex,))  # column for d/dx
    _, dy = jax.jvp(f, (coords,), (ey,))
    # rows are output components, columns are input derivatives
    return jnp.stack([dx, dy], axis=-1)
