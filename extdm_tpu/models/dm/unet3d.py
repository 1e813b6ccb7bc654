"""3D diffusion UNet over the flow+occlusion latent space.

One configurable module covering the reference denoiser family
(/root/reference/model/BaseDM_adaptor/DenoiseNet_*.py):

| reference file (variant)                  | config here                      |
|-------------------------------------------|----------------------------------|
| ..._wo_ref_adaptor_cross_multi            | use_ref_features=False           |
| ..._w_ref_adaptor_cross_multi_traj_u12/22 | conditioning="trajwarp"          |
| ..._w_ref_adaptor_cross_multi_traj_ada    | conditioning="adaptor"           |
| ..._traj_ada_u22 (the trained one)        | conditioning="adaptor", window   |
|                                           | (4,4,4), thw_bias available      |

Structure per scale (ref :1105-1139): time-conditioned ResnetBlock x2,
shifted+plain 3D window attention, MotionAdaptor, temporal attention with
T5 relative bias + rotary, down/up-sample. Two heads (flow 2ch + occlusion
1ch), both sliced to the prediction window (:1304-1305).

Layout: (B, T, H, W, C) — channels-last/TPU-native. `path=1` enables the
repro's THW combined bias (:1192-1221); unlike the reference we use the
actual T (=tc+tp) instead of the hard-coded 30.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from extdm_tpu.models.dm.adaptor import ChanLayerNorm, MotionAdaptor, TrajWarp
from extdm_tpu.nn.attention import (
    RelativePositionBias,
    RelativePositionBiasTHW,
    STWAttentionLayer,
    TemporalAttentionLayer,
)
from extdm_tpu.nn.initializers import torch_bias_init, torch_kernel_init
from extdm_tpu.nn.layers import ConvTranspose
from extdm_tpu.ops.resize import interpolate_bilinear

Dtype = Any


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Conv3d(nn.Module):
    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        pad = tuple((k // 2, k // 2) for k in ks)
        fan_in = x.shape[-1] * ks[0] * ks[1] * ks[2]
        return nn.Conv(self.features, ks, padding=pad, kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(fan_in), dtype=self.dtype)(x)


class Block3d(nn.Module):
    """conv(1,3,3) -> GroupNorm -> optional scale/shift -> SiLU (ref :238-253)."""

    features: int
    groups: int = 8
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = Conv3d(self.features, (1, 3, 3), dtype=self.dtype, name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)
        # flax norms promote with their f32 params (dtype=None), which
        # silently upcast the whole UNet main stream to f32 downstream —
        # 2x HBM on every activation pass and f32 qkv matmuls inside the
        # attention kernels. Keep the f32 statistics, cast the output back.
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock3d(nn.Module):
    """Two Block3d with FiLM-style time conditioning + residual (ref :257-279)."""

    features: int
    groups: int = 8
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        from extdm_tpu.ops import pallas_resnet

        film = None
        scale_shift = None
        if time_emb is not None:
            h = nn.silu(time_emb)
            film = nn.Dense(self.features * 2, kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(time_emb.shape[-1]),
                            dtype=self.dtype, name="mlp")(h)
            hh = film[:, None, None, None, :]
            scale_shift = jnp.split(hh, 2, axis=-1)
        b1 = Block3d(self.features, self.groups, self.dtype, name="block1")
        b2 = Block3d(self.features, self.groups, self.dtype, name="block2")
        rc = None
        if x.shape[-1] != self.features:
            rc = nn.Conv(self.features, (1, 1, 1), kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(x.shape[-1]), dtype=self.dtype,
                         name="res_conv")
        if (not self.is_initializing()) and pallas_resnet.route(
                x.shape, x.shape[-1], self.features, self.groups):
            # fused whole-block pallas path: both convs, GroupNorms, FiLM,
            # SiLUs and the residual in one program per sample. Children
            # are materialized on tiny slices only to define params (same
            # tree as the XLA path -> checkpoint compatible).
            hs, ws = min(x.shape[2], 8), min(x.shape[3], 8)
            tiny = b1(x[:, :1, :hs, :ws], None)
            _ = b2(tiny, None)
            if rc is not None:
                _ = rc(x[:, :1, :1, :1])
            p1 = b1.variables["params"]
            p2 = b2.variables["params"]
            wres = bres = None
            if rc is not None:
                wres = rc.variables["params"]["kernel"][0, 0, 0]
                bres = rc.variables["params"]["bias"]
            return pallas_resnet.fused_resnet_block(
                x,
                p1["proj"]["Conv_0"]["kernel"], p1["proj"]["Conv_0"]["bias"],
                p1["norm"]["scale"], p1["norm"]["bias"], film,
                p2["proj"]["Conv_0"]["kernel"], p2["proj"]["Conv_0"]["bias"],
                p2["norm"]["scale"], p2["norm"]["bias"],
                wres, bres, groups=self.groups)
        out = b1(x, scale_shift)
        out = b2(out)
        if rc is not None:
            x = rc(x)
        return out + x


class Downsample(nn.Module):
    """conv (1,4,4) stride (1,2,2) (ref :210-211)."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * 16
        return nn.Conv(self.features, (1, 4, 4), strides=(1, 2, 2),
                       padding=((0, 0), (1, 1), (1, 1)), kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(fan_in), dtype=self.dtype)(x)


class PreNormSTW(nn.Module):
    """Residual(PreNorm(STWAttentionLayer)) (ref :1109-1111)."""

    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    heads: int
    dim_head: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        from extdm_tpu.ops import pallas_stw

        stw = STWAttentionLayer(self.window_size, self.shift_size, self.heads,
                                self.dim_head, dtype=self.dtype, name="fn")
        if pallas_stw.enabled() or pallas_stw.spatial_scope_active():
            # fused whole-layer pallas path: LN + attention + residual in
            # one activation pass; the LN child only contributes its scale.
            ln = ChanLayerNorm(name="norm")
            _ = ln(x[:, :1, :1, :1])
            return stw(x, gamma=ln.variables["params"]["gamma"])
        h = ChanLayerNorm(name="norm")(x)
        return x + stw(h)


class PreNormTemporalAttn(nn.Module):
    """Residual(PreNorm(EinopsToAndFrom('b c t h w','b (h w) t c', AttnLayer)))."""

    heads: int
    dim_head: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, pos_bias=None):
        from extdm_tpu.ops import pallas_stw

        B, T, H, W, C = x.shape
        if pallas_stw.enabled() or pallas_stw.spatial_scope_active():
            # fused whole-layer pallas path: both norms, the (h w)<->T
            # transposes, attention and both residuals in one pass.
            ln = ChanLayerNorm(name="norm")
            _ = ln(x[:, :1, :1, :1])
            tal = TemporalAttentionLayer(self.heads, self.dim_head,
                                         dtype=self.dtype, name="fn")
            _ = tal(jnp.zeros((1, 1, T, C), x.dtype), pos_bias)
            p = tal.variables["params"]
            if pos_bias is None:
                bias_hnn = jnp.zeros((self.heads, T, T), jnp.float32)
            elif pos_bias.ndim == 4:  # THW combined: per-query reduction
                pb = pos_bias.mean(axis=(-2, -1))  # (heads, T)
                bias_hnn = jnp.broadcast_to(pb[:, :, None],
                                            (self.heads, T, T))
            else:
                bias_hnn = pos_bias
            return pallas_stw.fused_temporal_layer(
                x, ln.variables["params"]["gamma"],
                p["norm"]["scale"], p["norm"]["bias"],
                p["attn"]["to_qkv"]["kernel"], p["attn"]["to_out"]["kernel"],
                bias_hnn, heads=self.heads, dim_head=self.dim_head,
            )
        h = ChanLayerNorm(name="norm")(x)
        h = h.transpose(0, 2, 3, 1, 4).reshape(B, H * W, T, C)
        h = TemporalAttentionLayer(self.heads, self.dim_head, dtype=self.dtype,
                                   name="fn")(h, pos_bias)
        h = h.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)
        return x + h


class Unet3D(nn.Module):
    dim: int = 64
    out_grid_dim: int = 2
    out_conf_dim: int = 1
    window_size: Tuple[int, int, int] = (4, 4, 4)
    dim_mults: Sequence[int] = (1, 2, 4, 4)
    channels: int = 3  # latent channels of x (flow 2 + conf 1)
    cond_feature_dim: int = 256  # LFAE bottleneck channels
    attn_heads: int = 8
    attn_dim_head: int = 32
    init_dim: Optional[int] = None
    init_kernel_size: int = 7
    resnet_groups: int = 8
    use_final_activation: bool = False
    cond_num: int = 0
    pred_num: int = 0
    use_ref_features: bool = True
    conditioning: str = "adaptor"  # adaptor | trajwarp | none
    down_adaptor_from_level: int = 0  # ada: 0 (all levels); traj: 2
    cond_dim: Optional[int] = None  # text/class embedding dim (BERT: 768)
    learn_null_cond: bool = False
    remat: bool = True  # rematerialize per-level blocks (activation memory)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, time, cond_frames, cond_fea=None, path: int = 0,
                 cond=None, null_cond_mask=None, cond_cache=None,
                 cond_only: bool = False):
        """x: (B, tp, h, w, C) noisy pred latents; cond_frames: (B, tc, h, w, C);
        cond_fea: (B, tc+tp, hf, wf, cond_feature_dim) LFAE features.
        Returns (B, tp, h, w, out_grid_dim + out_conf_dim)."""
        tc, tp = cond_frames.shape[1], x.shape[1]
        assert tc == self.cond_num and tp == self.pred_num, (tc, tp)
        shift_size = tuple(w // 2 for w in self.window_size)
        heads, dim_head = self.attn_heads, self.attn_dim_head

        x = jnp.concatenate([cond_frames, x], axis=1)  # (B, T, h, w, C)
        B, T, H, W, _ = x.shape
        k0 = self.init_kernel_size

        # remat: trade recompute for activation memory — at KTH scale
        # (T=30, batch 8) the un-remat backward exceeds one chip's HBM.
        if self.remat:
            Res, STW = nn.remat(ResnetBlock3d), nn.remat(PreNormSTW)
            TAttn, Adap = nn.remat(PreNormTemporalAttn), nn.remat(MotionAdaptor)
        else:
            Res, STW, TAttn, Adap = ResnetBlock3d, PreNormSTW, PreNormTemporalAttn, MotionAdaptor

        # --- positional biases ------------------------------------------------
        if path == 1:
            t_bias, h_bias, w_bias = RelativePositionBiasTHW(
                heads=heads, max_distance=32, name="rel_pos_bias_thw"
            )(T, H, W)
            # resize spatial biases to (T, T) and combine (ref :1196-1221).
            def resize_bias(b):
                return interpolate_bilinear(b[..., None], (T, T))[..., 0]

            hb = resize_bias(h_bias)[:, None, :, :]  # (heads, 1, T, T) -> broadcast
            wb = resize_bias(w_bias)[:, :, None, :]
            tb = t_bias[:, :, None, :]  # query-major expand (heads, T, 1, T)
            alpha = self.param("alpha", nn.initializers.ones, (heads,))
            beta = self.param("beta", nn.initializers.ones, (heads,))
            combined = (
                alpha[:, None, None, None] * jnp.broadcast_to(tb, (heads, T, T, T))
                + beta[:, None, None, None]
                * (jnp.broadcast_to(hb, (heads, T, T, T)) + jnp.broadcast_to(wb, (heads, T, T, T)))
            )
            time_rel_pos_bias = combined  # 4D — reduced inside TemporalAttention
        else:
            time_rel_pos_bias = RelativePositionBias(
                heads=heads, max_distance=32, name="time_rel_pos_bias"
            )(T)

        # --- conditioning stream ----------------------------------------------
        init_dim = self.init_dim or self.dim
        if self.use_ref_features and self.conditioning != "trajwarp":
            # ada variants (..._ada_u22.py:1225-1239). The whole stream is
            # independent of (x, t): during DDIM sampling it is computed
            # ONCE (cond_only=True) and re-fed via cond_cache — the
            # reference recomputes it every denoise step. The init conv is
            # split by input channels (conv([x, cf]) == conv_x(x) +
            # conv_cf(cf) + bias), exactly equivalent to the reference's
            # single 259-channel conv.
            if cond_cache is None:
                assert cond_fea is not None
                fdim = self.cond_feature_dim
                if self.dtype is not None:
                    cond_fea = cond_fea.astype(self.dtype)
                cf = MotionAdaptor(tc, tp, dtype=self.dtype, name="cond_adaptor")(cond_fea)
                cf = PreNormTemporalAttn(heads, dim_head, dtype=self.dtype,
                                         name="cond_temporal_attn")(cf, time_rel_pos_bias)
                cf2 = cf.reshape((B * T,) + cf.shape[2:])
                cf2 = interpolate_bilinear(cf2, (H, W))
                cf2 = cf2.reshape(B, T, H, W, fdim)
                cond_cache = nn.Conv(
                    init_dim, (1, k0, k0),
                    padding=((0, 0), (k0 // 2, k0 // 2), (k0 // 2, k0 // 2)),
                    use_bias=False, kernel_init=torch_kernel_init,
                    dtype=self.dtype, name="init_conv_cond",
                )(cf2)
            if cond_only:
                return cond_cache
            x = Conv3d(init_dim, (1, k0, k0), dtype=self.dtype, name="init_conv")(x)
            x = x + cond_cache
        else:
            if self.use_ref_features:  # trajwarp variants
                assert cond_fea is not None
                fdim = self.cond_feature_dim
                # traj variants (..._traj_u12/u22.py:1029-1031): lift the
                # latent to feature width, cross-warp cond features toward
                # the noisy pred stream.
                x = Conv3d(fdim, (1, k0, k0), dtype=self.dtype, name="init_noise_conv")(x)
                cond_fea = TrajWarp(tc, tp, heads=heads, dtype=self.dtype,
                                    name="init_traj")(x[:, tc:], cond_fea)
                cf = cond_fea.reshape((B * T,) + cond_fea.shape[2:])
                cf = interpolate_bilinear(cf, (H, W))
                cf = cf.reshape(B, T, H, W, fdim)
                x = jnp.concatenate([x, cf], axis=-1)
            x = Conv3d(init_dim, (1, k0, k0), dtype=self.dtype, name="init_conv")(x)

        # --- init temporal attn -----------------------------------------
        r = x
        x = PreNormTemporalAttn(heads, dim_head, dtype=self.dtype,
                                name="init_temporal_attn")(x, time_rel_pos_bias)

        # --- time embedding -----------------------------------------------------
        time_dim = self.dim * 4
        t_emb = sinusoidal_pos_emb(time, self.dim)
        t_emb = nn.Dense(time_dim, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(self.dim), name="time_mlp_0")(t_emb)
        t_emb = nn.gelu(t_emb)
        t_emb = nn.Dense(time_dim, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(time_dim), name="time_mlp_1")(t_emb)

        # classifier-free guidance plumbing (ref :1254-1264): optional text/
        # class embedding concatenated to the time embedding; null_cond_mask
        # replaces per-sample conditions with the null embedding.
        if self.cond_dim is not None:
            if self.learn_null_cond:
                null_emb = self.param("null_cond_emb", nn.initializers.normal(1.0),
                                      (1, self.cond_dim))
            else:
                null_emb = jnp.zeros((1, self.cond_dim), t_emb.dtype)
            if cond is None:
                cond = jnp.broadcast_to(null_emb, (B, self.cond_dim))
            if null_cond_mask is not None:
                cond = jnp.where(null_cond_mask[:, None], null_emb, cond)
            t_emb = jnp.concatenate([t_emb, cond.astype(t_emb.dtype)], axis=-1)

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        def adaptor_block(name, h):
            # per-level MotionAdaptor exists in both ada and traj variants
            if self.conditioning in ("adaptor", "trajwarp"):
                return Adap(tc, tp, dtype=self.dtype, name=name)(h)
            return h

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = Res(dim_out, self.resnet_groups, self.dtype, name=f"down{ind}_block1")(x, t_emb)
            x = Res(dim_out, self.resnet_groups, self.dtype, name=f"down{ind}_block2")(x, t_emb)
            x = STW(self.window_size, shift_size, heads, dim_head, self.dtype,
                    name=f"down{ind}_stw1")(x)
            x = STW(self.window_size, (0, 0, 0), heads, dim_head, self.dtype,
                    name=f"down{ind}_stw2")(x)
            if ind >= self.down_adaptor_from_level:  # traj variants gate ind>1
                x = adaptor_block(f"down{ind}_adaptor", x)
            x = TAttn(heads, dim_head, self.dtype,
                      name=f"down{ind}_tattn")(x, time_rel_pos_bias)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, self.dtype, name=f"down{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = Res(mid_dim, self.resnet_groups, self.dtype, name="mid_block1")(x, t_emb)
        x = STW(self.window_size, shift_size, heads, dim_head, self.dtype, name="mid_attn1")(x)
        x = STW(self.window_size, (0, 0, 0), heads, dim_head, self.dtype, name="mid_attn2")(x)
        x = adaptor_block("mid_adaptor", x)
        x = Res(mid_dim, self.resnet_groups, self.dtype, name="mid_block2")(x, t_emb)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= num_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = Res(dim_in, self.resnet_groups, self.dtype, name=f"up{ind}_block1")(x, t_emb)
            x = Res(dim_in, self.resnet_groups, self.dtype, name=f"up{ind}_block2")(x, t_emb)
            x = STW(self.window_size, shift_size, heads, dim_head, self.dtype,
                    name=f"up{ind}_stw1")(x)
            x = STW(self.window_size, (0, 0, 0), heads, dim_head, self.dtype,
                    name=f"up{ind}_stw2")(x)
            if ind > 1:  # ref :1136 — adaptor only on the deeper up levels
                x = adaptor_block(f"up{ind}_adaptor", x)
            x = TAttn(heads, dim_head, self.dtype,
                      name=f"up{ind}_tattn")(x, time_rel_pos_bias)
            if not is_last:
                x = ConvTranspose(dim_in, (1, 4, 4), (1, 2, 2), dtype=self.dtype,
                                  name=f"up{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)

        flow = ResnetBlock3d(self.dim, self.resnet_groups, self.dtype, name="final_block")(x)
        flow = nn.Conv(self.out_grid_dim, (1, 1, 1), kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(self.dim), dtype=self.dtype,
                       name="final_conv")(flow)
        occ = ResnetBlock3d(self.dim, self.resnet_groups, self.dtype, name="occlusion_block")(x)
        occ = nn.Conv(self.out_conf_dim, (1, 1, 1), kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init(self.dim), dtype=self.dtype,
                      name="occlusion_conv")(occ)
        out = jnp.concatenate([flow, occ], axis=-1)
        if self.use_final_activation:
            out = jnp.tanh(out)
        return out[:, tc:].astype(jnp.float32)
