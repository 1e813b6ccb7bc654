"""Background motion predictor: one 3x3 transform per pair.

Semantics match /root/reference/model/LFAE/bg_motion_predictor.py:15-64.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from extdm_tpu.nn.layers import Encoder


class BGMotionPredictor(nn.Module):
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    bg_type: str = "zero"  # zero | shift | affine | perspective
    train: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, source, driving):
        """source, driving: (B, H, W, C). Returns (B, 3, 3)."""
        assert self.bg_type in ("zero", "shift", "affine", "perspective")
        B = source.shape[0]
        eye = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
        if self.bg_type == "zero":
            return eye

        feats = Encoder(
            self.block_expansion,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            train=self.train,
            dtype=self.dtype,
            name="encoder",
        )(jnp.concatenate([source, driving], axis=-1))
        pooled = feats[-1].mean(axis=(1, 2)).astype(jnp.float32)  # (B, C)

        n_out = {"shift": 2, "affine": 6, "perspective": 8}[self.bg_type]
        bias0 = {
            "shift": [0.0, 0.0],
            "affine": [1.0, 0.0, 0.0, 0.0, 1.0, 0.0],
            "perspective": [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
        }[self.bg_type]
        pred = nn.Dense(
            n_out,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(bias0, dtype),
            name="fc",
        )(pooled)

        if self.bg_type == "shift":
            out = eye.at[:, :2, 2].set(pred)
        elif self.bg_type == "affine":
            out = eye.at[:, :2, :].set(pred.reshape(B, 2, 3))
        else:  # perspective
            out = eye.at[:, :2, :].set(pred[:, :6].reshape(B, 2, 3))
            out = out.at[:, 2, :2].set(pred[:, 6:].reshape(B, 2))
        return out
