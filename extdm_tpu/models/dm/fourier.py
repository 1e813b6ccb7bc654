"""Random Fourier positional features for (B, T, H, W, C) volumes.

Mirrors /root/reference/model/BaseDM_adaptor/RandomFourierEncoding.py:7-62
(FourierEncoding3D — present but dead code in the reference; kept for API
completeness). Adds sin/cos features of random T/H/W frequencies projected
back to the channel dim.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FourierEncoding3D(nn.Module):
    num_frequencies: int = 10
    seed: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        rng = np.random.RandomState(self.seed)
        freqs = rng.randn(3, self.num_frequencies).astype(np.float32)

        t = np.linspace(-1, 1, T)
        h = np.linspace(-1, 1, H)
        w = np.linspace(-1, 1, W)
        tt, hh, ww = np.meshgrid(t, h, w, indexing="ij")  # (T, H, W)
        coords = np.stack([tt, hh, ww], -1)  # (T, H, W, 3)
        angles = 2 * np.pi * coords @ freqs  # (T, H, W, F)
        feats = np.concatenate([np.sin(angles), np.cos(angles)], -1)
        feats = jnp.asarray(feats, x.dtype if self.dtype is None else self.dtype)
        feats = jnp.broadcast_to(feats[None], (B,) + feats.shape)
        proj = nn.Dense(C, use_bias=False, dtype=self.dtype, name="proj")(feats)
        return x + proj
