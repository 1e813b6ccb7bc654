"""FVD: Fréchet Video Distance over I3D features.

Pipeline matches /root/reference/metrics/fvd.py + calculate_fvd.py:
- preprocess: bilinear resize shorter side -> 224 (align_corners=False),
  center crop, [0,1] -> [-1,1] (fvd.py:161-187);
- features: I3D pre-softmax 400-d (fvd.py:41-49);
- distance: scipy sqrtm Fréchet (fvd.py:276-291);
- drivers: calculate_fvd1 (raw videos), calculate_fvd2 (precomputed feats),
  get_feats (calculate_fvd.py:61-77).

Weights: pass converted params (convert.torch2jax.convert_i3d) for
published-number comparability; otherwise a fixed-seed random I3D is used
and results carry pretrained=False.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import sqrtm

from extdm_tpu.metrics.i3d import InceptionI3d
from extdm_tpu.ops.resize import interpolate_bilinear


def preprocess_videos(videos: jnp.ndarray, resolution: int = 224) -> jnp.ndarray:
    """(B, T, H, W, C) in [0,1] -> (B, T, 224, 224, C) in [-1,1]."""
    B, T, H, W, C = videos.shape
    scale = resolution / min(H, W)
    if H < W:
        target = (resolution, math.ceil(W * scale))
    else:
        target = (math.ceil(H * scale), resolution)
    flat = videos.reshape(B * T, H, W, C)
    flat = interpolate_bilinear(flat, target)
    h0 = (target[0] - resolution) // 2
    w0 = (target[1] - resolution) // 2
    flat = flat[:, h0 : h0 + resolution, w0 : w0 + resolution]
    out = flat.reshape(B, T, resolution, resolution, C)
    return (out - 0.5) * 2.0


class I3DExtractor:
    """Holds an InceptionI3d + params; jitted batched feature extraction."""

    def __init__(self, params=None, seed: int = 0):
        self.model = InceptionI3d()
        self.pretrained = params is not None
        if params is None:
            dummy = jnp.zeros((1, 16, 224, 224, 3))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def get_feats(self, videos, bs: int = 10) -> np.ndarray:
        """videos: (N, T, H, W, C) numpy/jnp in [0,1]. Returns (N, 400)."""
        videos = jnp.asarray(videos)
        feats = []
        n = videos.shape[0]
        for i in range(0, n, bs):
            chunk = preprocess_videos(videos[i : i + bs])
            feats.append(np.asarray(self._fwd(self.params, chunk)))
        return np.concatenate(feats, axis=0)


def compute_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return feats.mean(axis=0), np.cov(feats, rowvar=False)


def frechet_distance(feats_fake: np.ndarray, feats_real: np.ndarray) -> float:
    """stylegan-v protocol (ref fvd.py:276-291).

    Non-finite features short-circuit to nan: LAPACK's Schur
    decomposition (inside scipy sqrtm) can spin forever on NaN input —
    observed wedging a training run's periodic validation for 40+
    minutes. A loud nan beats a silent hang."""
    if not (np.isfinite(feats_fake).all() and np.isfinite(feats_real).all()):
        import warnings

        warnings.warn("frechet_distance: non-finite I3D features; "
                      "returning nan (sqrtm on NaN matrices can hang)")
        return float("nan")
    mu_gen, sigma_gen = compute_stats(feats_fake)
    mu_real, sigma_real = compute_stats(feats_real)
    m = float(np.square(mu_gen - mu_real).sum())
    if feats_fake.shape[0] > 1:
        s = sqrtm(np.dot(sigma_gen, sigma_real))  # scipy>=1.18: no disp arg
        return float(np.real(m + np.trace(sigma_gen + sigma_real - s * 2)))
    return float(np.real(m))


def calculate_fvd1(videos1, videos2, extractor: I3DExtractor, bs: int = 10) -> float:
    """videos: (N, T, H, W, C) in [0,1]. FVD(videos1, videos2)."""
    f1 = extractor.get_feats(videos1, bs)
    f2 = extractor.get_feats(videos2, bs)
    return frechet_distance(f1, f2)


def calculate_fvd2(feats1: np.ndarray, feats2: np.ndarray) -> float:
    return frechet_distance(feats1, feats2)


def get_feats(videos, extractor: I3DExtractor, bs: int = 10) -> np.ndarray:
    return extractor.get_feats(videos, bs)


def best_trajectory_by_feature_distance(
    real_feats: np.ndarray, traj_feats: np.ndarray, num_sample: int
) -> np.ndarray:
    """Best-of-n selection by I3D-feature L1 distance
    (scripts/DM/valid.py:229-236). traj_feats: (N*num_sample, 400) grouped
    per real video; returns indices (N,) into each group."""
    n = real_feats.shape[0]
    traj = traj_feats.reshape(n, num_sample, -1)
    d = np.abs(traj - real_feats[:, None]).sum(-1)
    return d.argmin(axis=1)
