"""LPIPS perceptual distance (AlexNet backbone, linear calibration).

Re-implements the external `lpips` package the reference depends on
(/root/reference/metrics/calculate_lpips.py:9-23): inputs in [-1, 1],
scaling layer, AlexNet relu1-5 features, per-channel unit-normalize,
squared diff, learned 1x1 linear heads, spatial map upsampled+meaned
(spatial=True), and the 1/2/3 aggregation variants (lpips2 = min over
trajectories).

Calibrated weights: convert with extdm_tpu.convert.torch2jax.convert_lpips
from an `lpips` checkpoint file; fixed-seed random heads otherwise
(deterministic, not comparable with published numbers).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips ScalingLayer constants
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

_ALEX_CFG = [
    # (features, kernel, stride, padding, pool_before)
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


class AlexNetFeatures(nn.Module):
    """relu1..relu5 feature maps of torchvision AlexNet.features."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        for i, (feats, k, s, p, pool_before) in enumerate(_ALEX_CFG):
            if pool_before:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(feats, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """Inputs: (B, H, W, 3) in [-1, 1]. Returns per-sample distance (B,)."""

    spatial: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x0, x1):
        def scale(x):
            return (x - _SHIFT) / _SCALE

        net = AlexNetFeatures(dtype=self.dtype, name="net")
        f0 = net(scale(x0))
        f1 = net(scale(x1))

        H, W = x0.shape[1:3]
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            # lpips normalize_tensor: eps OUTSIDE the sqrt
            a = a / (jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.uniform(0.1), (diff.shape[-1], 1))
            val = diff @ jnp.abs(w)  # lpips clamps lin weights >= 0
            if self.spatial:
                from extdm_tpu.ops.resize import interpolate_bilinear

                val = interpolate_bilinear(val, (H, W))
                total = total + val
            else:
                total = total + val.mean(axis=(1, 2), keepdims=True)
        return total.mean(axis=(1, 2, 3))


class LPIPSMetric:
    def __init__(self, params=None, seed: int = 0, spatial: bool = True):
        self.model = LPIPS(spatial=spatial)
        self.pretrained = params is not None
        if params is None:
            dummy = jnp.zeros((1, 64, 64, 3))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), dummy, dummy)
        self.params = params
        self._fwd = jax.jit(lambda p, a, b: self.model.apply(p, a, b))

    def _video_matrix(self, videos1, videos2) -> np.ndarray:
        """(B, T) lpips matrix; inputs (B, T, H, W, C) in [0, 1]."""
        v1 = jnp.asarray(videos1) * 2.0 - 1.0
        v2 = jnp.asarray(videos2) * 2.0 - 1.0
        B, T = v1.shape[:2]
        flat1 = v1.reshape((B * T,) + v1.shape[2:])
        flat2 = v2.reshape((B * T,) + v2.shape[2:])
        out = np.asarray(self._fwd(self.params, flat1, flat2))
        return out.reshape(B, T)

    def calculate_lpips1(self, videos1, videos2) -> Tuple[dict, dict]:
        mat = self._video_matrix(videos1, videos2)
        per_video = mat.mean(axis=1)
        return (
            {"lpips": per_video.mean(), "lpips_per_frame": mat.mean(axis=0)},
            {"lpips": per_video.std(), "lpips_per_frame": mat.std(axis=0)},
        )

    def calculate_lpips2(self, videos1, videos2, num_sample: int) -> float:
        mat = self._video_matrix(videos1, videos2).mean(axis=1).reshape(-1, num_sample)
        return float(mat.min(axis=1).mean())

    def calculate_lpips3(self, videos1, videos2) -> np.ndarray:
        return self._video_matrix(videos1, videos2)
