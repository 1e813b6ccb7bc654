"""Inception-I3D feature extractor for FVD (flax, channels-last).

Mirrors the architecture of /root/reference/metrics/pytorch_i3d.py:135-321
(which itself mirrors the TorchScript i3d used by the FVD protocol):
Inception-v1 inflated to 3D, TF-style SAME padding, BN(eps 1e-3), 400-way
logits head with temporal averaging. `return_features=True` (the FVD
setting, fvd.py:44) returns the 400-d pre-softmax features.

Pretrained weights: convert the reference TorchScript blob (when present)
with extdm_tpu.convert.torch2jax.convert_i3d; otherwise a fixed-seed random
init gives a *deterministic* but non-comparable feature space (flagged by
`pretrained=False` in FVD results).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

INCEPTION_CHANNELS = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


def _same_pad(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF SAME padding amounts for one dim."""
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - size % stride, 0)
    return pad // 2, pad - pad // 2


def max_pool_same(x, kernel, stride):
    dims = x.shape[1:4]
    pads = [(0, 0)] + [_same_pad(s, k, st) for s, k, st in zip(dims, kernel, stride)] + [(0, 0)]
    x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride), padding="VALID")


class Unit3D(nn.Module):
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    # 1e-3 matches the TF kinetics-i3d / TorchScript FVD backbone; the
    # reference's pure-torch fallback (metrics/pytorch_i3d.py:69) uses
    # torch's 1e-5 — pass bn_eps=1e-5 when loading weights from it.
    bn_eps: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dims = x.shape[1:4]
        pads = [_same_pad(s, k, st) for s, k, st in zip(dims, self.kernel, self.stride)]
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pads, use_bias=self.use_bias, dtype=self.dtype, name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=self.bn_eps, dtype=self.dtype,
                             name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionModule(nn.Module):
    out_channels: List[int]
    dtype: Any = None
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), bn_eps=self.bn_eps, dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(oc[1], (1, 1, 1), bn_eps=self.bn_eps, dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), bn_eps=self.bn_eps, dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(oc[3], (1, 1, 1), bn_eps=self.bn_eps, dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(oc[4], (3, 3, 3), bn_eps=self.bn_eps, dtype=self.dtype, name="b2b")(b2)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), bn_eps=self.bn_eps, dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """Input: (B, T, H, W, 3) in [-1, 1] (the FVD preprocessing range).
    Returns 400-d features (pre-softmax logits averaged over time)."""

    num_classes: int = 400
    bn_eps: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), bn_eps=self.bn_eps, dtype=self.dtype, name="Conv3d_1a_7x7")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, (1, 1, 1), bn_eps=self.bn_eps, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), bn_eps=self.bn_eps, dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(INCEPTION_CHANNELS["Mixed_3b"], self.dtype, bn_eps=self.bn_eps, name="Mixed_3b")(x)
        x = InceptionModule(INCEPTION_CHANNELS["Mixed_3c"], self.dtype, bn_eps=self.bn_eps, name="Mixed_3c")(x)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"]:
            x = InceptionModule(INCEPTION_CHANNELS[name], self.dtype, bn_eps=self.bn_eps, name=name)(x)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(INCEPTION_CHANNELS["Mixed_5b"], self.dtype, bn_eps=self.bn_eps, name="Mixed_5b")(x)
        x = InceptionModule(INCEPTION_CHANNELS["Mixed_5c"], self.dtype, bn_eps=self.bn_eps, name="Mixed_5c")(x)

        # avg-pool (2, 7, 7) valid, then 1x1 logits conv, then temporal mean.
        # Short clips can reach this point with T'=1 (e.g. 8 input frames:
        # 8 -> 4 -> 2 -> 1 through the temporal strides); a hard kernel of
        # 2 would then produce a ZERO-size output whose temporal mean is
        # silently NaN — poisoning FVD and (via NaN covariance matrices)
        # wedging scipy sqrtm inside LAPACK. Clamp the temporal kernel to
        # the frames available (identical to the TorchScript backbone for
        # T' >= 2) and refuse degenerate spatial maps loudly.
        if x.shape[2] < 7 or x.shape[3] < 7:
            raise ValueError(
                f"I3D spatial map {x.shape[2]}x{x.shape[3]} < 7x7 before "
                f"the final avg_pool — input frames were not preprocessed "
                f"to 224x224")
        x = nn.avg_pool(x, (min(2, x.shape[1]), 7, 7), strides=(1, 1, 1),
                        padding="VALID")
        x = Unit3D(self.num_classes, (1, 1, 1), use_bn=False, activation=False,
                   use_bias=True, dtype=self.dtype, name="logits")(x)
        x = x.squeeze(axis=(2, 3))  # (B, T', C)
        return x.mean(axis=1)
