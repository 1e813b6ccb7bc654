"""SSIM over videos — reference semantics
(/root/reference/metrics/calculate_ssim.py): 11x11 gaussian window
(sigma 1.5), valid region, per-channel mean; same 1/2/3 aggregation
variants as PSNR.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # cv2.getGaussianKernel semantics
    xs = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(xs**2) / (2 * sigma**2))
    k /= k.sum()
    return np.outer(k, k)


_WINDOW = _gaussian_window()


def _filter2d_valid(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Correlate (H, W) with window, valid region (matches cv2.filter2D
    + [5:-5, 5:-5] crop)."""
    from scipy.signal import correlate2d

    return correlate2d(img, window, mode="valid")


def ssim_image(img1: np.ndarray, img2: np.ndarray) -> float:
    """img1/img2: (H, W) in [0,1]."""
    C1, C2 = 0.01**2, 0.03**2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = _filter2d_valid(img1, _WINDOW)
    mu2 = _filter2d_valid(img2, _WINDOW)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = _filter2d_valid(img1**2, _WINDOW) - mu1_sq
    s2 = _filter2d_valid(img2**2, _WINDOW) - mu2_sq
    s12 = _filter2d_valid(img1 * img2, _WINDOW) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return float(ssim_map.mean())


def ssim_frame(f1: np.ndarray, f2: np.ndarray) -> float:
    """(C, H, W) or (H, W) frames."""
    if f1.ndim == 2:
        return ssim_image(f1, f2)
    if f1.shape[0] == 1:
        return ssim_image(f1[0], f2[0])
    return float(np.mean([ssim_image(f1[c], f2[c]) for c in range(f1.shape[0])]))


def _per_frame_ssim(videos1, videos2) -> np.ndarray:
    v1, v2 = np.asarray(videos1), np.asarray(videos2)
    assert v1.shape == v2.shape
    B, T = v1.shape[:2]
    if v1.ndim == 5 and (v1.shape[3] < 11 or v1.shape[4] < 11):
        # Channels-last input reaches here with W == C == 3 and would
        # otherwise produce an empty 11x11 valid region (the native kernel
        # used to abort the whole process on it). Reference layout is
        # (B, T, C, H, W) — metrics/calculate_ssim.py:30-39.
        raise ValueError(
            f"SSIM expects channels-first (B, T, C, H, W) with H, W >= 11; "
            f"got {v1.shape} (channels-last input? transpose first)")
    # fast path: the native C++ kernel (extdm_tpu/native/ssim.cpp)
    if v1.ndim == 5:
        try:
            from extdm_tpu import native

            flat1 = v1.reshape((B * T,) + v1.shape[2:]).astype(np.float32)
            flat2 = v2.reshape((B * T,) + v2.shape[2:]).astype(np.float32)
            return native.ssim_batch(flat1, flat2).reshape(B, T)
        except Exception:  # native build unavailable -> scipy fallback
            pass
    out = np.zeros((B, T))
    for b in range(B):
        for t in range(T):
            out[b, t] = ssim_frame(v1[b, t], v2[b, t])
    return out


def calculate_ssim1(videos1, videos2) -> Tuple[Dict, Dict]:
    mat = _per_frame_ssim(videos1, videos2)
    per_video = mat.mean(axis=1)
    return (
        {"ssim": per_video.mean(), "ssim_per_frame": mat.mean(axis=0)},
        {"ssim": per_video.std(), "ssim_per_frame": mat.std(axis=0)},
    )


def calculate_ssim2(videos1, videos2, num_sample: int) -> float:
    mat = _per_frame_ssim(videos1, videos2).mean(axis=1).reshape(-1, num_sample)
    return float(mat.max(axis=1).mean())


def calculate_ssim3(videos1, videos2) -> np.ndarray:
    return _per_frame_ssim(videos1, videos2)
