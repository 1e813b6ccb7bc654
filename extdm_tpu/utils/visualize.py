"""Grid / strip / gif visualizers for training artifacts.

Covers the reference's utils/visualize.py:14-344 (pics / row strips /
bordered comparison gif-grids with cond=blue pred=orange borders,
LFAE_visualize, sample_img) with numpy + imageio only (mediapy-free).
Videos here are (T, H, W, C) float in [0, 1].
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

COND_COLOR = (0, 114, 189)  # blue
PRED_COLOR = (217, 83, 25)  # orange


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def add_border(frame: np.ndarray, color, width: int = 2) -> np.ndarray:
    """frame: (H, W, 3) uint8."""
    out = frame.copy()
    c = np.asarray(color, np.uint8)
    out[:width], out[-width:] = c, c
    out[:, :width], out[:, -width:] = c, c
    return out


def video_strip(video: np.ndarray, max_frames: int = 10) -> np.ndarray:
    """(T, H, W, C) -> one horizontal strip image."""
    T = video.shape[0]
    step = max(1, T // max_frames)
    frames = [to_uint8(video[t]) for t in range(0, T, step)][:max_frames]
    return np.concatenate(frames, axis=1)


def comparison_grid(rows: Sequence[np.ndarray], max_frames: int = 10) -> np.ndarray:
    """Stack strips of several videos (e.g. real / recon / sample)."""
    strips = [video_strip(v, max_frames) for v in rows]
    w = min(s.shape[1] for s in strips)
    return np.concatenate([s[:, :w] for s in strips], axis=0)


def bordered_video(video: np.ndarray, cond_frames: int) -> List[np.ndarray]:
    """Frames with blue borders for cond, orange for pred (ref :60-120)."""
    out = []
    for t in range(video.shape[0]):
        color = COND_COLOR if t < cond_frames else PRED_COLOR
        out.append(add_border(to_uint8(video[t]), color))
    return out


def save_gif(path: str, frames: Sequence[np.ndarray], fps: int = 10) -> None:
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.mimsave(path, list(frames), duration=1000.0 / fps, loop=0)


def save_image(path: str, img: np.ndarray) -> None:
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.imwrite(path, img if img.dtype == np.uint8 else to_uint8(img))


def visualize_comparison_gif(
    path: str,
    real: np.ndarray,
    sample: np.ndarray,
    cond_frames: int,
    fps: int = 10,
) -> None:
    """Side-by-side real|sample gif with cond/pred borders (ref :60-161)."""
    real_frames = bordered_video(real, cond_frames)
    sample_frames = bordered_video(sample, cond_frames)
    frames = [np.concatenate([r, s], axis=1) for r, s in zip(real_frames, sample_frames)]
    save_gif(path, frames, fps)


def lfae_visualize(
    path_prefix: str,
    real: np.ndarray,
    recon: np.ndarray,
    warped: Optional[np.ndarray] = None,
    max_frames: int = 10,
) -> None:
    """Reconstruction grid: real / recon / (warped) (ref LFAE_visualize :283-336)."""
    rows = [real, recon] + ([warped] if warped is not None else [])
    save_image(path_prefix + "_grid.png", comparison_grid(rows, max_frames))
