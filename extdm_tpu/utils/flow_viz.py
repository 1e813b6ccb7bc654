"""Flow / confidence / warped-grid visualization (host-side numpy).

Replaces the reference's flow_vis + matplotlib helpers (utils/misc.py:43-118)
without the flow_vis dependency: the standard Middlebury/Baker color wheel
is implemented directly.
"""
from __future__ import annotations

import numpy as np


def _make_colorwheel() -> np.ndarray:
    """(55, 3) Middlebury color wheel (Baker et al., ICCV 2007)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = _make_colorwheel()


def flow_to_color(flow: np.ndarray, clip: float | None = None) -> np.ndarray:
    """(H, W, 2) flow (u, v) -> (H, W, 3) uint8 color image."""
    u, v = flow[..., 0].astype(np.float64), flow[..., 1].astype(np.float64)
    if clip is not None:
        u, v = np.clip(u, -clip, clip), np.clip(v, -clip, clip)
    rad = np.sqrt(u**2 + v**2)
    rad_max = max(rad.max(), 1e-8)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u**2 + v**2)

    a = np.arctan2(-v, -u) / np.pi
    n = _WHEEL.shape[0]
    fk = (a + 1) / 2 * (n - 1)
    k0 = np.floor(fk).astype(int) % n
    k1 = (k0 + 1) % n
    f = fk - np.floor(fk)
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = 1 - rad * (1 - col)  # saturate toward white at low magnitude
        img[..., c] = np.floor(255 * col)
    return img


def grid_to_flow(grid: np.ndarray) -> np.ndarray:
    """Backward-warp grid (H, W, 2) in [-1,1] -> displacement flow in pixels
    (matches the reference's grid2fig motion interpretation)."""
    h, w = grid.shape[:2]
    ident_x, ident_y = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    u = (grid[..., 0] - ident_x) * (w - 1) / 2
    v = (grid[..., 1] - ident_y) * (h - 1) / 2
    return np.stack([u, v], axis=-1)


def flow2fig(grid: np.ndarray) -> np.ndarray:
    """(H, W, 2) warp grid -> color visualization (ref misc.py:65-72)."""
    return flow_to_color(grid_to_flow(grid))


def conf2fig(conf: np.ndarray) -> np.ndarray:
    """(H, W, 1) or (H, W) confidence in [0,1] -> uint8 grayscale image."""
    c = np.asarray(conf)
    if c.ndim == 3:
        c = c[..., 0]
    return (np.clip(c, 0, 1) * 255).astype(np.uint8)
