"""Core NN building blocks (flax.linen, channels-last).

LFAE blocks mirror /root/reference/model/LFAE/util.py:69-222 semantically:
conv + BatchNorm + ReLU variants, hourglass encoder/decoder. BatchNorm here
is the TPU-native SyncBN: under pjit global-view semantics a plain batch
mean/variance *is* the cross-replica statistic (XLA inserts the collectives
along the data mesh axis), so the vendored master/slave SyncBN machinery of
the reference (model/LFAE/sync_batchnorm/) collapses to flax BatchNorm.
"""
from __future__ import annotations

import contextlib
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from extdm_tpu.nn.initializers import torch_bias_init, torch_kernel_init
from extdm_tpu.ops.resize import avg_pool_2x2, upsample_nearest

Dtype = Any


class Conv(nn.Module):
    """Conv with torch-default init and symmetric zero padding.

    Works for 2D (B, H, W, C) and 3D (B, T, H, W, C) inputs depending on
    the length of `kernel_size`.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[int] | str | None = None
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        if self.padding is None:
            pad = tuple((k // 2, k // 2) for k in ks)
        elif isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = tuple((p, p) for p in self.padding)
        fan_in = x.shape[-1] // self.feature_group_count
        for k in ks:
            fan_in *= k
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=tuple(self.strides) if self.strides else None,
            padding=pad,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv (torch ConvTranspose semantics: out = in * stride).

    Used by the UNet3D upsampler (kernel (1,4,4), stride (1,2,2), pad 1).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        st = tuple(self.strides)
        # torch: out = (in-1)*s - 2p + k with p = (k-s)//2  ==> out = in*s.
        # lax.conv_transpose pads the dilated input, where torch padding p
        # corresponds to k - 1 - p per side.
        pad = tuple(k - 1 - (k - s) // 2 for k, s in zip(ks, st))
        fan_in = x.shape[-1]
        for k in ks:
            fan_in *= k
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=tuple((p, p) for p in pad),
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
            dtype=self.dtype,
            name="dense",
        )(x)


# SyncBN under shard_map: GSPMD/pjit computes BN statistics over the global
# batch automatically, but an explicit shard_map body sees LOCAL shapes, so
# cross-replica stats need flax's axis_name pmean. This trace-time context
# switches every BatchNorm in the model at once (reference vendors
# Synchronized-BatchNorm-PyTorch for the same purpose,
# model/LFAE/sync_batchnorm/batchnorm.py:48-80).
_SYNC_BN_AXIS: "list[str | None]" = [None]


@contextlib.contextmanager
def sync_bn_axis(axis_name: str):
    """Within this scope (wrap the *traced* body, e.g. inside a shard_map
    function), BatchNorm reduces batch statistics across `axis_name`."""
    _SYNC_BN_AXIS.append(axis_name)
    try:
        yield
    finally:
        _SYNC_BN_AXIS.pop()


class BatchNorm(nn.Module):
    """BatchNorm2d with torch hyper-params (eps 1e-5, momentum 0.1).

    Cross-replica by construction: statistics are taken over the *global*
    batch under pjit, which is exactly what the reference's SyncBN does.
    Under an explicit shard_map, wrap the body in `sync_bn_axis("data")`.
    """

    use_running_average: bool
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=_SYNC_BN_AXIS[-1],
            name="bn",
        )(x)


class SameBlock2d(nn.Module):
    """conv -> BN -> ReLU, preserving resolution (util.py:134-149)."""

    features: int
    kernel_size: int = 3
    train: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (self.kernel_size, self.kernel_size), dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class DownBlock2d(nn.Module):
    """conv -> BN -> ReLU -> avgpool2 (util.py:114-131)."""

    features: int
    kernel_size: int = 3
    train: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (self.kernel_size, self.kernel_size), dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm")(x)
        x = nn.relu(x)
        return avg_pool_2x2(x)


class UpBlock2d(nn.Module):
    """nearest-2x -> conv -> BN -> ReLU (util.py:94-111)."""

    features: int
    kernel_size: int = 3
    train: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest(x, 2)
        x = Conv(self.features, (self.kernel_size, self.kernel_size), dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class ResBlock2d(nn.Module):
    """BN -> ReLU -> conv, twice, with residual (util.py:69-91)."""

    kernel_size: int = 3
    train: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm1")(x)
        h = nn.relu(h)
        h = Conv(features, (self.kernel_size, self.kernel_size), dtype=self.dtype, name="conv1")(h)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="norm2")(h)
        h = nn.relu(h)
        h = Conv(features, (self.kernel_size, self.kernel_size), dtype=self.dtype, name="conv2")(h)
        return h + x


class Encoder(nn.Module):
    """Hourglass encoder: stack of DownBlock2d; returns all feature maps
    [input, d1, ..., dN] (util.py:152-172)."""

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    train: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        outs = [x]
        for i in range(self.num_blocks):
            feats = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            outs.append(
                DownBlock2d(feats, train=self.train, dtype=self.dtype, name=f"down{i}")(outs[-1])
            )
        return outs


class Decoder(nn.Module):
    """Hourglass decoder with skip concat (util.py:175-203).

    out_filters = block_expansion + in_features.
    """

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    train: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, skips):
        skips = list(skips)
        out = skips.pop()
        for j, i in enumerate(reversed(range(self.num_blocks))):
            feats = min(self.max_features, self.block_expansion * (2**i))
            out = UpBlock2d(feats, train=self.train, dtype=self.dtype, name=f"up{j}")(out)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        return out


class Hourglass(nn.Module):
    """Encoder + decoder (util.py:206-221)."""

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    train: bool = True
    dtype: Dtype = None

    @property
    def out_filters(self) -> int:
        # decoder output channels given in_features at call time is
        # block_expansion + in_features; exposed for conv-head sizing.
        raise NotImplementedError("use static formula block_expansion + in_features")

    @nn.compact
    def __call__(self, x):
        feats = Encoder(
            self.block_expansion, self.num_blocks, self.max_features,
            train=self.train, dtype=self.dtype, name="encoder",
        )(x)
        return Decoder(
            self.block_expansion, self.num_blocks, self.max_features,
            train=self.train, dtype=self.dtype, name="decoder",
        )(feats)
