"""Dataset converters / synthesizers.

The reference README documents converter scripts (data/SMMNIST/01_*.py,
data/KTH/0{1,2,3}_*.py, data/BAIR/bair_convert.py — absent from the
snapshot, README.md:77-132). This module supplies:

- `make_moving_shapes_dataset`: a Stochastic-Moving-MNIST-style synthetic
  set (bouncing sprites, grayscale 64x64) generated without network access
  — suitable for CPU-runnable end-to-end training/eval and CI.
- `write_video_hdf5`: writes any (N, T, H, W[, C]) uint8 array in the
  reference HDF5 layout so VideoDataset/TwoFramesDataset can read it.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from extdm_tpu.data.h5 import HDF5VideoWriter


def _make_sprite(rng: np.random.RandomState, size: int = 12) -> np.ndarray:
    """A random digit-like blob sprite (H, W) uint8."""
    canvas = np.zeros((size, size), np.float32)
    for _ in range(rng.randint(2, 5)):
        x0, y0 = rng.randint(0, size - 4, size=2)
        w, h = rng.randint(2, max(3, size // 2), size=2)
        canvas[y0 : y0 + h, x0 : x0 + w] = rng.uniform(0.6, 1.0)
    return (canvas * 255).astype(np.uint8)


def make_moving_shapes_video(
    rng: np.random.RandomState,
    num_frames: int = 30,
    image_size: int = 64,
    num_sprites: int = 2,
    sprite_size: int = 12,
) -> np.ndarray:
    """(T, H, W) uint8 bouncing-sprites clip (SMMNIST-style dynamics)."""
    frames = np.zeros((num_frames, image_size, image_size), np.float32)
    for _ in range(num_sprites):
        sprite = _make_sprite(rng, sprite_size).astype(np.float32)
        pos = rng.uniform(0, image_size - sprite_size, size=2)
        vel = rng.uniform(-3, 3, size=2)
        for t in range(num_frames):
            # bounce
            for d in range(2):
                if pos[d] < 0:
                    pos[d], vel[d] = -pos[d], -vel[d]
                hi = image_size - sprite_size
                if pos[d] > hi:
                    pos[d], vel[d] = 2 * hi - pos[d], -vel[d]
            y, x = int(round(pos[0])), int(round(pos[1]))
            frames[t, y : y + sprite_size, x : x + sprite_size] = np.maximum(
                frames[t, y : y + sprite_size, x : x + sprite_size], sprite
            )
            pos += vel
    return frames.clip(0, 255).astype(np.uint8)


def write_video_hdf5(videos: np.ndarray, out_dir: str, num_per_shard: int = 1000,
                     force: bool = True) -> None:
    """videos: (N, T, H, W[, C]) uint8 -> reference-layout shards."""
    writer = HDF5VideoWriter(out_dir, num_per_shard=num_per_shard, force=force)
    for vid in videos:
        writer.add_video(list(vid))
    writer.close()


def make_moving_shapes_dataset(
    root_dir: str,
    num_train: int = 64,
    num_valid: int = 16,
    num_frames: int = 30,
    image_size: int = 64,
    seed: int = 0,
) -> str:
    """Create {root}/train and {root}/valid shards; returns root_dir."""
    rng = np.random.RandomState(seed)
    for split, n in [("train", num_train), ("valid", num_valid)]:
        vids = np.stack(
            [make_moving_shapes_video(rng, num_frames, image_size) for _ in range(n)]
        )
        write_video_hdf5(vids, os.path.join(root_dir, split))
    return root_dir
