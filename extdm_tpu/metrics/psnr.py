"""PSNR over videos — reference semantics
(/root/reference/metrics/calculate_psnr.py): per-frame MSE -> dB (cap 100),
per-video mean over frames, then:
- `calculate_psnr1`: mean/std over videos (per-frame lists too),
- `calculate_psnr2`: best-of-n trajectories (max of per-video means),
- `calculate_psnr3`: raw (video, frame) matrix.
Inputs: (B, T, C, H, W) or (B, T, H, W, C) arrays in [0, 1].
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _per_frame_psnr(videos1: np.ndarray, videos2: np.ndarray) -> np.ndarray:
    """(B, T) psnr matrix."""
    v1 = np.asarray(videos1, np.float64)
    v2 = np.asarray(videos2, np.float64)
    assert v1.shape == v2.shape
    axes = tuple(range(2, v1.ndim))
    mse = ((v1 - v2) ** 2).mean(axis=axes)
    with np.errstate(divide="ignore"):
        psnr = 20 * np.log10(1.0 / np.sqrt(mse))
    return np.where(mse < 1e-10, 100.0, psnr)


def calculate_psnr1(videos1, videos2) -> Tuple[Dict, Dict]:
    mat = _per_frame_psnr(videos1, videos2)
    per_video = mat.mean(axis=1)
    result = {"psnr": per_video.mean(), "psnr_per_frame": mat.mean(axis=0)}
    result_std = {"psnr": per_video.std(), "psnr_per_frame": mat.std(axis=0)}
    return result, result_std


def calculate_psnr2(videos1, videos2, num_sample: int) -> float:
    """Best-of-n: videos are repeated trajectories; (B*n, T, ...) vs same.
    Returns mean over videos of the max-over-trajectory per-video psnr."""
    mat = _per_frame_psnr(videos1, videos2).mean(axis=1)  # (B*n,)
    mat = mat.reshape(-1, num_sample)
    return float(mat.max(axis=1).mean())


def calculate_psnr3(videos1, videos2) -> np.ndarray:
    return _per_frame_psnr(videos1, videos2)
