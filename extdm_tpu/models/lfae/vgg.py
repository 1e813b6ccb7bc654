"""VGG19 feature extractor for the multi-scale perceptual loss.

Mirrors /root/reference/model/LFAE/model.py:19-60 (torchvision vgg19
features split after relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1, with
ImageNet normalization). Pretrained torchvision weights are converted with
`extdm_tpu.convert.torch2jax.convert_vgg19` when a weights file is
available; with random init the loss is still a valid (weaker) perceptual
metric — documented fallback for the no-egress environment.
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

# (out_channels, pool_before) per conv, grouped by returned slice.
_SLICES = [
    [(64, False)],                               # -> relu1_1
    [(64, False), (128, True)],                  # -> relu2_1
    [(128, False), (256, True)],                 # -> relu3_1
    [(256, False), (256, False), (256, False), (512, True)],   # -> relu4_1
    [(512, False), (512, False), (512, False), (512, True)],   # -> relu5_1
]

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class Vgg19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] features.

    Input: (B, H, W, 3) in [0, 1].
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        if self.dtype is not None:
            x = x.astype(self.dtype)
        outs = []
        idx = 0
        for sl in _SLICES:
            for feats, pool_before in sl:
                if pool_before:
                    x = max_pool_2x2(x)
                x = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            outs.append(x)
        return outs
