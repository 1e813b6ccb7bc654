"""Closed-form symmetric 2x2 eigendecomposition.

The reference RegionPredictor runs `torch.svd` on per-region 2x2 covariance
matrices (/root/reference/model/LFAE/region_predictor.py:16-25,142-148) and
uses `sqrt = U diag(sqrt(S))` as the region affine. For symmetric PSD 2x2
matrices the SVD equals the eigendecomposition; the closed form below is
exact, batched, fully vectorized VPU work (no LAPACK loop), and has stable
gradients thanks to an epsilon-regularized eigengap.
"""
from __future__ import annotations

import jax.numpy as jnp


def eigh_2x2(covar: jnp.ndarray, eps: float = 1e-12):
    """Eigendecomposition of symmetric (..., 2, 2) matrices.

    Returns (u, s): eigenvector columns u (..., 2, 2), eigenvalues
    s (..., 2) in *descending* order (matching torch.svd's singular-value
    ordering for PSD inputs).
    """
    a = covar[..., 0, 0]
    b = 0.5 * (covar[..., 0, 1] + covar[..., 1, 0])
    c = covar[..., 1, 1]

    tr_half = 0.5 * (a + c)
    det_term = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0) + eps)
    lam1 = tr_half + det_term  # larger
    lam2 = tr_half - det_term

    # Eigenvector for lam1. Two algebraically equivalent forms exist:
    # (b, lam1 - a) and (lam1 - c, b). Pick per-element the one whose
    # non-b component avoids catastrophic cancellation (lam1 ~ max(a, c)).
    use_first = a < c
    v1x = jnp.where(use_first, b, lam1 - c)
    v1y = jnp.where(use_first, lam1 - a, b)
    norm_sq = v1x * v1x + v1y * v1y
    # fully degenerate (a == c, b == 0): any direction is an eigenvector.
    degenerate = norm_sq < eps
    v1x = jnp.where(degenerate, jnp.ones_like(v1x), v1x)
    v1y = jnp.where(degenerate, jnp.zeros_like(v1y), v1y)
    norm = jnp.sqrt(jnp.where(degenerate, 1.0, norm_sq) + eps)
    v1x, v1y = v1x / norm, v1y / norm
    # Second eigenvector is the 90-degree rotation (right-handed frame).
    v2x, v2y = -v1y, v1x

    u = jnp.stack(
        [jnp.stack([v1x, v2x], axis=-1), jnp.stack([v1y, v2y], axis=-1)], axis=-2
    )  # columns are eigenvectors
    s = jnp.stack([lam1, lam2], axis=-1)
    return u, s


def sqrt_symmetric_2x2(covar: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """U diag(sqrt(max(S, 0))) for symmetric PSD (..., 2, 2) matrices.

    This is the `affine` the reference derives from the PCA covariance.
    """
    u, s = eigh_2x2(covar, eps=eps)
    s_sqrt = jnp.sqrt(jnp.maximum(s, 0.0) + eps)
    return u * s_sqrt[..., None, :]


def inv_2x2(m: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Batched closed-form 2x2 inverse."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    inv = jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
    )
    return inv / det[..., None, None]
