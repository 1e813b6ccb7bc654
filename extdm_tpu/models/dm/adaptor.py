"""Motion Adaptor — the distribution-extrapolation module (ExtDM's core).

Semantics match /root/reference/model/BaseDM_adaptor/
DenoiseNet_..._ada_u22.py:767-860 and the TrajWarp alternative (:947-970).
Layout: (B, T, H, W, C).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from extdm_tpu.nn.initializers import torch_bias_init, torch_kernel_init


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm (gamma only, biased variance) over the last axis.

    Matches reference LayerNorm (:214-223) which normalizes the channel dim
    of (B, C, T, H, W); here channels are last.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        # statistics in f32, output in the input dtype — promoting with the
        # f32 gamma would silently upcast the whole bf16 stream downstream
        # (2x HBM traffic + f32 matmuls in the attention kernels).
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        return ((x32 - mean) / jnp.sqrt(var + self.eps) * gamma).astype(x.dtype)


class _PointwiseConvParams(nn.Module):
    """Pointwise conv computed as a 2D matmul but declaring the SAME param
    tree as ``nn.Conv`` (kernel (1,)*k + (Cin, Cout), bias (Cout,)) so
    checkpoints and the torch converters are unaffected.

    Motivation (measured, batch-32 KTH UNet trace): XLA lowers 1x1x1
    ``convolution`` ops with batch-second-minor layouts and inserts
    transpose copies around every adaptor conv — the MotionAdaptor's glue
    (pads/slices/copies around its convs) totalled ~30 ms of a 212 ms UNet
    forward. A plain dot keeps the row-major channels-last layout."""

    features: int
    kernel_dims: int = 3
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kshape = (1,) * self.kernel_dims + (cin, self.features)
        kernel = self.param("kernel", torch_kernel_init, kshape)
        w = kernel.reshape(cin, self.features)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        elif x.dtype != w.dtype:
            # nn.Conv promotes mixed operand dtypes; lax.dot_general raises.
            common = jnp.promote_types(x.dtype, w.dtype)
            x, w = x.astype(common), w.astype(common)
        lead = x.shape[:-1]
        y = jax.lax.dot_general(
            x.reshape(-1, cin), w,
            dimension_numbers=(((1,), (0,)), ((), ())))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(cin), (self.features,))
            y = y + bias.astype(y.dtype)
        return y.reshape(lead + (self.features,))


class Conv3d1x1(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # param-compatible with the previous nn.Conv((1,1,1)) child
        return _PointwiseConvParams(self.features, 3, self.use_bias,
                                    self.dtype, name="Conv_0")(x)


def compute_layer(tm: int, tp: int):
    """Number of cond-window doublings needed to cover tp (+1) frames (:767-771)."""
    factor = (tp + 1) / tm
    num_layers = max(1, int(math.ceil(math.log2(factor))))
    num_frames = (2**num_layers - 1) * tm
    return num_layers, num_frames


class Extrapolator(nn.Module):
    """`adaptor` (:781-827): normalize per (N,C) over (T,H,W), residual-conv
    in normalized space, re-scale, concat along T — doubling the window per
    layer. Returns only the extrapolated frames."""

    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xm):
        tm = xm.shape[1]
        # predictor: Residual(PreNorm(conv1x1))
        xm = xm + Conv3d1x1(xm.shape[-1], dtype=self.dtype, name="predictor")(
            ChanLayerNorm(name="predictor_norm")(xm)
        )
        x = xm
        for i in range(self.num_layers):
            r = x
            # stats in f32; the normalized stream stays in the compute dtype
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=(1, 2, 3), keepdims=True)
            # unbiased (ddof=1) variance: ref calc_mean_std uses torch
            # Tensor.var's default (:797-806)
            var = x32.reshape(x.shape[0], -1, x.shape[-1]).var(axis=1, ddof=1)
            std = jnp.sqrt(var + 1e-5)[:, None, None, None, :]
            xh = ((x32 - mean) / std).astype(x.dtype)
            xh = xh + nn.Conv(
                x.shape[-1], (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)),
                use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype,
                name=f"extrapolator{i}",
            )(xh)
            x = (xh.astype(jnp.float32) * std + mean).astype(x.dtype)
            x = jnp.concatenate([r, x], axis=1)
        return x[:, tm:]


class MotionAdaptor(nn.Module):
    """Extrapolate cond-frame features into the pred window and fuse
    (:829-860)."""

    tc: int
    tp: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        assert T == self.tc + self.tp, (T, self.tc, self.tp)
        xm, xp = x[:, : self.tc], x[:, self.tc :]

        num_layers, num_frames = compute_layer(self.tc, self.tp)
        xm2p = Extrapolator(num_layers, dtype=self.dtype, name="adaptors")(xm)
        # Tmodulator: (B, nf, H, W, C) x (nf, C, tp*C) -> (B, H, W, tp*C).
        # Same math as the reference's T-major channel flatten + 1x1 Conv2d
        # (kernel rows ordered (nf major, C minor) == the flatten order),
        # but expressed as ONE dot_general so XLA never materializes the
        # (B, H, W, nf*C) transpose or conv-layout copies around it.
        kshape = (1, 1, num_frames * C, C * self.tp)
        w_t = _TmodParams(kshape, num_frames * C, self.dtype,
                          name="Tmodulator")()
        w3 = w_t[0].reshape(num_frames, C, C * self.tp)
        if self.dtype is not None:
            xc = xm2p.astype(self.dtype)
        elif xm2p.dtype != w3.dtype:
            # nn.Conv promotes mixed operand dtypes; lax.dot_general raises.
            common = jnp.promote_types(xm2p.dtype, w3.dtype)
            xc, w3 = xm2p.astype(common), w3.astype(common)
        else:
            xc = xm2p
        y = jax.lax.dot_general(
            xc, w3, dimension_numbers=(((1, 4), (0, 1)), ((), ())))
        y = y + w_t[1].astype(y.dtype)          # (B, H, W, tp*C)
        y = y.reshape(B, H, W, self.tp, C)

        import os
        if os.environ.get("EXTDM_ADAPTOR_TMAJOR", "1") == "1":
            # fuse in the stream's native (B, tp, H, W, C) form: ONE
            # transpose (of y) instead of transposing xp in and the
            # result back out — the b32 UNet trace showed XLA picking a
            # B-second-minor layout around this pipeline and paying
            # ~7 ms/fwd in layout-copy fusions (IMPLEMENTATION_NOTES
            # round-4 fusion-bucket table).
            y_t = y.transpose(0, 3, 1, 2, 4)    # (B, tp, H, W, C)
            fused_in = jnp.concatenate([y_t, xp], axis=-1)
            fused = Conv3d1x1(C, dtype=self.dtype, name="fuser")(
                ChanLayerNorm(name="fuser_norm")(fused_in)
            )
            return jnp.concatenate([xm, fused + xp], axis=1)

        # round-3 form: fuse in (B, H, W, tp, C) (kept for A/B)
        xp_t = xp.transpose(0, 2, 3, 1, 4)      # (B, H, W, tp, C)
        fused_in = jnp.concatenate([y, xp_t], axis=-1)
        fused = Conv3d1x1(C, dtype=self.dtype, name="fuser")(
            ChanLayerNorm(name="fuser_norm")(fused_in)
        )
        xp = (fused + xp_t).transpose(0, 3, 1, 2, 4)
        return jnp.concatenate([xm, xp], axis=1)


class _TmodParams(nn.Module):
    """Declares the Tmodulator params with the exact nn.Conv tree
    (Tmodulator/kernel (1, 1, nf*C, tp*C), Tmodulator/bias) and returns
    them — the matmul runs in the parent for layout control."""

    kshape: tuple
    fan_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, self.kshape)
        bias = self.param("bias", torch_bias_init(self.fan_in),
                          (self.kshape[-1],))
        if self.dtype is not None:
            kernel, bias = kernel.astype(self.dtype), bias.astype(self.dtype)
        return kernel, bias


class TrajWarp(nn.Module):
    """Cross-attention feature warp: pred queries attend to cond keys/values
    (:947-970); used by the `traj_u12/u22` denoiser variants. `x_query` is
    the (already downsampled externally, here via max-pool) noisy-pred
    feature; `f` is the cond+pred stream being warped."""

    tc: int
    tp: int
    heads: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, xp, f):
        B, T, H, W, C = f.shape
        fm, fp = f[:, : self.tc], f[:, self.tc :]
        # max-pool the (2x finer) query spatially down to f's resolution
        xp = nn.max_pool(xp.reshape((B * self.tp,) + xp.shape[2:]), (2, 2), strides=(2, 2))
        assert xp.shape[1:3] == (H, W), (xp.shape, f.shape)
        xp = xp.reshape(B, self.tp, H, W, C)

        def flat(a):
            return a.reshape(B, -1, C)

        q = flat(xp)
        kv = flat(fm)
        hd = C // self.heads

        def dense(n, a):
            return nn.Dense(C, kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(C), dtype=self.dtype, name=n)(a)

        q, k, v = nn.relu(dense("linear_q", q)), nn.relu(dense("linear_k", kv)), nn.relu(dense("linear_v", kv))

        def split(a):
            return a.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = nn.softmax(
            (q @ jnp.swapaxes(k, -1, -2)) / jnp.sqrt(jnp.asarray(hd, q.dtype)), axis=-1
        )
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, -1, C)
        out = nn.relu(dense("linear_o", out))
        fm2p = out.reshape(B, self.tp, H, W, C)

        fp = jnp.concatenate([fp, fm2p], axis=-1)
        fp = Conv3d1x1(C, dtype=self.dtype, name="fuser")(fp)
        return jnp.concatenate([fm, fp], axis=1)
