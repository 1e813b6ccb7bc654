"""FlowDiffusion: frozen LFAE + 3D UNet + Gaussian diffusion.

Mirrors /root/reference/model/BaseDM_adaptor/VideoFlowDiffusion_multi_w_ref_u22.py
(and the multi / multi1248 / w_ref variant wrappers via config) with a
TPU-first restructuring:

- The reference's per-frame Python loop over the LFAE (:265-295) becomes a
  single batched pass: all frames fold into the batch dim, so the region
  predictor / bg predictor / flow predictor run as one large NHWC conv
  stack on the MXU.
- The reference's 2-GPU manual placement (:176,213,225, .to() hops) is
  gone: everything is one jitted graph; parallelism comes from the mesh.
- Stage-1 runs under stop_gradient (the reference freezes + eval()s LFAE);
  BatchNorm uses running averages exactly like `.eval()`.
- The expensive pixel decode used only for the monitoring rec losses
  (:348-398, no grad path) is optional (`with_rec_losses`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from extdm_tpu.models.dm.diffusion import DiffusionSchedule, GaussianDiffusion
from extdm_tpu.models.dm.unet3d import Unet3D
from extdm_tpu.models.lfae.bg_predictor import BGMotionPredictor
from extdm_tpu.models.lfae.generator import Generator
from extdm_tpu.models.lfae.region_predictor import RegionPredictor

Array = jnp.ndarray



def _pred_conf(sample_conf, tc):
    return None if sample_conf is None else sample_conf[:, tc:]

def _merge_bt(x: Array) -> Array:
    """(B, T, ...) -> (B*T, ...)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def _split_bt(x: Array, b: int) -> Array:
    return x.reshape((b, x.shape[0] // b) + x.shape[1:])


class LFAE(nn.Module):
    """Frozen stage-1 bundle used inside the DM (region + bg + generator)."""

    flow_params: dict
    dtype: Any = None

    def setup(self):
        fp = self.flow_params
        rp_params = {k: v for k, v in fp["region_predictor_params"].items()
                     if k != "fast_svd"}  # closed-form eigh is always "fast"
        self.region_predictor = RegionPredictor(
            num_regions=fp["num_regions"],
            estimate_affine=fp.get("estimate_affine", True),
            train=False,
            dtype=self.dtype,
            **rp_params,
        )
        self.bg_predictor = BGMotionPredictor(
            train=False, dtype=self.dtype, **fp["bg_predictor_params"]
        )
        self.generator = Generator(
            num_regions=fp["num_regions"],
            num_channels=fp["num_channels"],
            revert_axis_swap=fp.get("revert_axis_swap", True),
            train=False,
            dtype=self.dtype,
            **fp["generator_params"],
        )

    def encode_video(self, video: Array, cond_frames: int, with_decode: bool = False) -> Dict[str, Array]:
        """video: (B, T, H, W, C) in [0,1]. Batched pseudo-GT encode.

        Returns flow (B,T,h,w,2), conf (B,T,h,w,1), ref features
        (B, T, hf, wf, 256) laid out as the reference does (:297-304):
        per-frame bottle features for cond frames 0..tc-2, then the ref
        frame's bottleneck repeated for the remaining 1+tp frames.
        """
        B, T = video.shape[:2]
        tc = cond_frames
        ref_img = video[:, tc - 1]

        source_params = self.region_predictor(ref_img)
        # fold frames into batch for the driving params
        frames = _merge_bt(video)
        driving_params = self.region_predictor(frames)
        ref_rep = jnp.repeat(ref_img, T, axis=0)  # (B*T, H, W, C) — frame-major per sample

        # NOTE: repeat must match _merge_bt layout: sample-major. jnp.repeat
        # on axis 0 with T repeats each sample T times -> [b0 x T, b1 x T...],
        # matching video.reshape(B*T) ordering. ✓
        bg_params = self.bg_predictor(ref_rep, frames)

        src_broadcast = {
            k: jnp.repeat(v, T, axis=0) for k, v in source_params.items() if k != "heatmap"
        }
        if with_decode:
            gen = self.generator(ref_rep, driving_params, src_broadcast, bg_params)
        else:
            gen = self.generator(ref_rep, driving_params, src_broadcast, bg_params,
                                 mode="encode_flow")
        flow = _split_bt(gen["optical_flow"], B)  # (B, T, h, w, 2)
        conf = _split_bt(gen["occlusion_map"], B) if "occlusion_map" in gen else None

        out = {"flow": flow, "conf": conf,
               "source_region_params": source_params}
        if with_decode:
            out["out_vid"] = _split_bt(gen["prediction"], B)
            out["warped_vid"] = _split_bt(gen["deformed"], B)
        return out

    def ref_features(self, video: Array, cond_frames: int, pred_frames: int) -> Array:
        """(B, tc+tp, hf, wf, 256) conditioning features (ref :297-304)."""
        B = video.shape[0]
        tc, tp = cond_frames, pred_frames
        cond_imgs = _merge_bt(video[:, :tc])  # includes the ref frame at tc-1
        feats = self.generator(cond_imgs, mode="bottle")["bottle_neck_feat"]
        feats = _split_bt(feats, B)  # (B, tc, hf, wf, 256)
        ref_feat = feats[:, tc - 1 : tc]
        return jnp.concatenate(
            [feats[:, : tc - 1], jnp.repeat(ref_feat, 1 + tp, axis=1)], axis=1
        )

    def decode_flows(self, ref_img: Array, flow: Array, conf: Optional[Array]) -> Dict[str, Array]:
        """Decode (B, T, h, w, 2) flows + (B, T, h, w, 1) conf to pixels with
        the frozen generator (`forward_with_flow`, ref :152-206).

        TPU-native restructuring: the reference re-encodes the ref frame for
        every decoded frame; here the encoder runs ONCE per video and its
        features/skips are repeated across the T flows (exactly equivalent —
        the encoder is flow-independent)."""
        B, T = flow.shape[:2]
        enc = self.generator(ref_img, mode="encode_feats")
        ref_rep = jnp.repeat(ref_img, T, axis=0)
        gen = self.generator(
            ref_rep,
            mode="flow_decode",
            optical_flow=_merge_bt(flow),
            occlusion_map=_merge_bt(conf) if conf is not None else None,
            feat=jnp.repeat(enc["feat"], T, axis=0),
            skips=tuple(jnp.repeat(s, T, axis=0) for s in enc["skips"]),
        )
        return {
            "out_vid": _split_bt(gen["prediction"], B),
            "warped_vid": _split_bt(gen["deformed"], B),
        }

    def __call__(self, video, cond_frames):
        # init trace: with_decode=True touches every generator submodule
        # (encoder, flow predictor, bottleneck, decoder, final) so all
        # parameters exist regardless of which method is applied later.
        return self.encode_video(video, cond_frames, with_decode=True)


@dataclass(frozen=True)
class FlowDiffusionConfig:
    flow_params: dict
    cond_frames: int
    pred_frames: int
    frame_shape: int = 64
    timesteps: int = 1000
    sampling_timesteps: int = 10
    ddim_eta: float = 1.0
    loss_type: str = "l2"
    use_residual_flow: bool = False
    dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4, 4)
    window_size: Tuple[int, int, int] = (4, 4, 4)
    attn_heads: int = 8
    attn_dim_head: int = 32
    use_ref_features: bool = True
    conditioning: str = "adaptor"
    down_adaptor_from_level: int = 0
    path: int = 0  # 1 -> THW combined bias (repro's u22 addition)
    with_rec_losses: bool = False
    remat: bool = True  # per-level UNet rematerialization (activation HBM)
    dtype: Any = None

    @property
    def bottleneck_dim(self) -> int:
        gp = self.flow_params["generator_params"]
        return min(
            gp.get("max_features", 512),
            gp.get("block_expansion", 64) * 2 ** gp.get("num_down_blocks", 2),
        )

    def make_unet(self) -> Unet3D:
        return Unet3D(
            cond_feature_dim=self.bottleneck_dim,
            dim=self.dim,
            dim_mults=tuple(self.dim_mults),
            window_size=tuple(self.window_size),
            attn_heads=self.attn_heads,
            attn_dim_head=self.attn_dim_head,
            cond_num=self.cond_frames,
            pred_num=self.pred_frames,
            use_ref_features=self.use_ref_features,
            conditioning=self.conditioning,
            down_adaptor_from_level=self.down_adaptor_from_level,
            remat=self.remat,
            dtype=self.dtype,
        )

    def make_lfae(self) -> LFAE:
        return LFAE(flow_params=self.flow_params, dtype=self.dtype)

    def make_diffusion(self) -> GaussianDiffusion:
        return GaussianDiffusion(
            schedule=DiffusionSchedule.create(self.timesteps),
            sampling_timesteps=self.sampling_timesteps,
            ddim_eta=self.ddim_eta,
            loss_type=self.loss_type,
        )


class FlowDiffusion:
    """Functional composition of (frozen LFAE, UNet, diffusion process).

    Holds module *definitions* only; parameters travel explicitly through
    the jitted train/sample functions (see extdm_tpu/train/dm_trainer.py).
    """

    def __init__(self, cfg: FlowDiffusionConfig):
        self.cfg = cfg
        self.lfae = cfg.make_lfae()
        self.unet = cfg.make_unet()
        self.diffusion = cfg.make_diffusion()

    # ---- initialization ------------------------------------------------------
    def init_variables(self, key: jax.Array) -> Tuple[Any, Any]:
        """Returns (lfae_variables, unet_variables) with toy-shaped tracing."""
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        H = cfg.frame_shape
        tc, tp = cfg.cond_frames, cfg.pred_frames
        video = jnp.zeros((1, tc + tp, H, H, cfg.flow_params["num_channels"]))
        lfae_vars = jax.jit(self.lfae.init, static_argnums=(2,))(k1, video, tc)

        scale = cfg.flow_params["generator_params"][
            "pixelwise_flow_predictor_params"
        ].get("scale_factor", 0.5)
        h = int(H * scale)
        hf = H // (2 ** cfg.flow_params["generator_params"].get("num_down_blocks", 2))
        fdim = cfg.bottleneck_dim
        x = jnp.zeros((1, tp, h, h, 3))
        cond = jnp.zeros((1, tc, h, h, 3))
        fea = jnp.zeros((1, tc + tp, hf, hf, fdim)) if cfg.use_ref_features else None
        unet_vars = jax.jit(
            lambda k, x, t, c, f: self.unet.init(k, x, t, c, f, path=cfg.path)
        )(k2, x, jnp.zeros((1,), jnp.int32), cond, fea)
        return lfae_vars, unet_vars

    # ---- latent helpers ---------------------------------------------------------
    def _identity_grid(self, h: int, w: int) -> Array:
        from extdm_tpu.ops.coords import make_coordinate_grid

        return make_coordinate_grid(h, w)[None, None]  # (1, 1, h, w, 2)

    def latents_from_encode(self, enc: Dict[str, Array]) -> Array:
        """cat(flow, conf*2-1) channels-last (ref :336-339); with
        use_residual_flow the identity grid is subtracted first (:333-336)."""
        flow, conf = enc["flow"], enc["conf"]
        if self.cfg.use_residual_flow:
            flow = flow - self._identity_grid(*flow.shape[2:4])
        if conf is None:
            conf = jnp.zeros_like(flow[..., :1])
            return jnp.concatenate([flow, conf], axis=-1)
        return jnp.concatenate([flow, conf * 2.0 - 1.0], axis=-1)

    def flow_from_pred(self, pred: Array) -> Array:
        """Predicted latents -> absolute flow (re-adds the identity grid for
        residual mode, ref :351-355, :475-481)."""
        flow = pred[..., :2]
        if self.cfg.use_residual_flow:
            flow = flow + self._identity_grid(*flow.shape[2:4])
        return flow

    def denoise_fn(self, unet_variables, cond_cache=None):
        def fn(x, t, cond_frames, cond_fea):
            return self.unet.apply(unet_variables, x, t, cond_frames, cond_fea,
                                   path=self.cfg.path, cond_cache=cond_cache)
        return fn

    def cond_cache(self, unet_variables, x_cond, fea):
        """Precompute the (x, t)-invariant conditioning stream once per
        sample call instead of once per DDIM step (see Unet3D docnote)."""
        if fea is None or self.cfg.conditioning == "trajwarp":
            return None
        B, tc, h, w, C = x_cond.shape
        tp = self.cfg.pred_frames
        x_dummy = jnp.zeros((B, tp, h, w, C), x_cond.dtype)
        t_dummy = jnp.zeros((B,), jnp.int32)
        return self.unet.apply(unet_variables, x_dummy, t_dummy, x_cond, fea,
                               path=self.cfg.path, cond_only=True)

    # ---- training loss ---------------------------------------------------------
    def loss(
        self,
        lfae_variables,
        unet_variables,
        key: jax.Array,
        video: Array,
    ) -> Tuple[Array, Dict[str, Array]]:
        """video: (B, tc+tp, H, W, C) in [0,1]. Returns (eps-loss, aux)."""
        from extdm_tpu.ops import pallas_resnet, pallas_stw

        # resnet blocks whose dedicated backward kernel fits trace the
        # fused forward + pallas backward; the rest keep the pure-XLA
        # path end to end (pallas fwd + XLA-recompute bwd is a measured
        # net loss) — per-shape routing in pallas_resnet.route.
        with pallas_resnet.train_scope():
            if pallas_stw.backward_kernels_enabled():
                # fused attention layers train with dedicated pallas
                # backward kernels — forward AND backward single-pass.
                return self._loss_impl(lfae_variables, unet_variables,
                                       key, video)
            with pallas_stw.inference_only_scope():
                return self._loss_impl(lfae_variables, unet_variables,
                                       key, video)

    def _loss_impl(self, lfae_variables, unet_variables, key, video):
        cfg = self.cfg
        tc, tp = cfg.cond_frames, cfg.pred_frames

        enc = jax.lax.stop_gradient(
            self.lfae.apply(lfae_variables, video, tc,
                            method=LFAE.encode_video)
        )
        fea = None
        if cfg.use_ref_features:
            fea = jax.lax.stop_gradient(
                self.lfae.apply(lfae_variables, video, tc, tp,
                                method=LFAE.ref_features)
            )
        frames = self.latents_from_encode(enc)
        x_cond = frames[:, :tc]
        x_pred = frames[:, tc : tc + tp]

        loss, pred_x0 = self.diffusion.p_losses(
            self.denoise_fn(unet_variables), key, x_cond, x_pred, fea
        )
        aux: Dict[str, Array] = {"loss": loss}

        if cfg.with_rec_losses:
            ref_img = video[:, tc - 1]
            fake_flow = self.flow_from_pred(pred_x0)
            fake_conf = (pred_x0[..., 2:3] + 1.0) * 0.5
            dec = jax.lax.stop_gradient(
                self.lfae.apply(lfae_variables, ref_img, fake_flow, fake_conf,
                                method=LFAE.decode_flows)
            )
            gt_pred = video[:, tc : tc + tp]
            aux["rec_loss"] = jnp.abs(gt_pred * 10.0 - dec["out_vid"] * 10.0).mean()
            aux["rec_warp_loss"] = jnp.abs(gt_pred * 10.0 - dec["warped_vid"] * 10.0).mean()
        return loss, aux

    # ---- training artifact monitor ------------------------------------------------
    def make_monitor(self):
        """Jitted monitor for DM-training img/vidshot artifacts (ref
        scripts/DM/train.py:281-399). The reference computes these tensors
        inside *every* training forward (no-grad decodes, u22.py:348-411);
        here they live in a separate program invoked only at
        save_img_freq/save_vid_freq, so the hot train step stays lean.

        Returns fn(lfae_variables, unet_variables, key, video) -> dict with
        the reference ret-dict keys: ref_imgs, real/fake_out_vid,
        real/fake_warped_vid, real/fake_vid_grid, real/fake_vid_conf.
        video: (B, tc+tp, H, W, C) in [0,1]; fake_* are built from the
        training-step pred_x0 at a random diffusion time (same as ref).
        """
        cfg = self.cfg
        tc, tp = cfg.cond_frames, cfg.pred_frames

        @jax.jit
        def monitor(lv, uv, key, video):
            enc = self.lfae.apply(lv, video, tc, True, method=LFAE.encode_video)
            fea = None
            if cfg.use_ref_features:
                fea = self.lfae.apply(lv, video, tc, tp, method=LFAE.ref_features)
            frames = self.latents_from_encode(enc)
            _, pred_x0 = self.diffusion.p_losses(
                self.denoise_fn(uv), key, frames[:, :tc], frames[:, tc : tc + tp], fea
            )
            fake_flow = self.flow_from_pred(pred_x0)
            fake_conf = None
            if enc["conf"] is not None:
                fake_conf = (pred_x0[..., 2:3] + 1.0) * 0.5
            dec = self.lfae.apply(lv, video[:, tc - 1], fake_flow, fake_conf,
                                  method=LFAE.decode_flows)
            return {
                "ref_imgs": video[:, tc - 1],
                "real_out_vid": enc["out_vid"],
                "real_warped_vid": enc["warped_vid"],
                "real_vid_grid": enc["flow"],
                "real_vid_conf": enc["conf"],
                "fake_out_vid": dec["out_vid"],
                "fake_warped_vid": dec["warped_vid"],
                "fake_vid_grid": fake_flow,
                "fake_vid_conf": fake_conf,
            }

        return monitor

    # ---- sampling ---------------------------------------------------------------
    def make_sampler(self, lfae_variables, unet_variables, decode: bool = True):
        """Split-program sampler: encode / DDIM-scan / finalize+decode as
        three separately compiled XLA programs. Functionally identical to
        `sample_video`; split because the tunneled TPU's remote-compile
        service rejects oversized programs, and all glue ops live inside
        the jits (every op outside a jit costs a host round-trip on the
        tunneled device). Returns fn(key, cond_video) -> same dict as
        `sample_video`."""
        cfg = self.cfg
        tc, tp = cfg.cond_frames, cfg.pred_frames

        # NOTE: variables are jit *arguments*, never closure captures —
        # captured arrays get inlined into the HLO as constants, which blows
        # the program past the remote-compile service's size limit (HTTP 413)
        # and defeats the compilation cache.
        @jax.jit
        def encode(lv, cond_video):
            enc = self.lfae.apply(lv, cond_video, tc, method=LFAE.encode_video)
            fea = None
            if cfg.use_ref_features:
                fea = self.lfae.apply(lv, cond_video, tc, tp,
                                      method=LFAE.ref_features)
            return enc, fea, self.latents_from_encode(enc)

        @jax.jit
        def ddim(uv, key, x_cond, fea, init_noise=None):
            cache = self.cond_cache(uv, x_cond, fea)
            return self.diffusion.sample(self.denoise_fn(uv, cache), key,
                                         x_cond, tp, fea,
                                         init_noise=init_noise)

        @jax.jit
        def finalize(lv, cond_video, enc_flow, enc_conf, pred):
            sample_flow = jnp.concatenate([enc_flow, self.flow_from_pred(pred)], axis=1)
            sample_conf = None
            if enc_conf is not None:
                sample_conf = jnp.concatenate(
                    [enc_conf, (pred[..., 2:3] + 1.0) * 0.5], axis=1)
            out = {
                "sample_vid_grid": sample_flow,
                "sample_vid_conf": sample_conf,
                "real_vid_grid": enc_flow,
                "real_vid_conf": enc_conf,
            }
            if decode:
                # decode only the tp predicted frames: the eval protocol
                # (ref scripts/DM/valid.py:176) splices REAL cond pixels in
                # front of the prediction and discards decoded cond frames,
                # so decoding them is pure waste (~1/3 of decode time at
                # KTH's 10/20 split).
                dec = self.lfae.apply(lv, cond_video[:, tc - 1],
                                      sample_flow[:, tc:], _pred_conf(sample_conf, tc),
                                      method=LFAE.decode_flows)
                out["sample_out_vid"] = jnp.concatenate(
                    [cond_video.astype(dec["out_vid"].dtype), dec["out_vid"]], axis=1)
                out["sample_warped_vid"] = jnp.concatenate(
                    [cond_video.astype(dec["warped_vid"].dtype), dec["warped_vid"]],
                    axis=1)
            return out

        def sampler(key, cond_video, init_noise=None):
            enc, fea, x_cond = encode(lfae_variables, cond_video)
            pred = ddim(unet_variables, key, x_cond, fea, init_noise)
            return finalize(lfae_variables, cond_video, enc["flow"], enc["conf"], pred)

        return sampler

    def make_sharded_sampler(self, lfae_variables, unet_variables, mesh,
                             decode: bool = True):
        """Data-parallel sampler: the batch axis (videos x trajectories —
        the eval protocol's 100 trajectories/video are embarrassingly
        parallel) is sharded over the mesh's 'data' axis with shard_map,
        so each chip runs the same per-chip program as `make_sampler`
        (pallas mega-kernels see LOCAL shapes; no GSPMD resharding).

        Per-shard PRNG: shard i draws with fold_in(key, i) — a batch entry
        on shard i of the sharded sampler matches the plain sampler run on
        that shard's slice with the folded key (tests/test_parallel.py).

        Returns fn(key, cond_video) -> same dict as `make_sampler`;
        cond_video's leading dim must divide by mesh.shape['data'].
        """
        from jax.sharding import PartitionSpec as P

        cfg = self.cfg
        tc, tp = cfg.cond_frames, cfg.pred_frames
        n_data = mesh.shape["data"]
        rep, data = P(), P("data")

        def local_body(lv, uv, key, cond_video):
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            enc = self.lfae.apply(lv, cond_video, tc, method=LFAE.encode_video)
            fea = None
            if cfg.use_ref_features:
                fea = self.lfae.apply(lv, cond_video, tc, tp,
                                      method=LFAE.ref_features)
            x_cond = self.latents_from_encode(enc)
            cache = self.cond_cache(uv, x_cond, fea)
            pred = self.diffusion.sample(self.denoise_fn(uv, cache), key,
                                         x_cond, tp, fea)
            sample_flow = jnp.concatenate(
                [enc["flow"], self.flow_from_pred(pred)], axis=1)
            sample_conf = None
            if enc["conf"] is not None:
                sample_conf = jnp.concatenate(
                    [enc["conf"], (pred[..., 2:3] + 1.0) * 0.5], axis=1)
            out = {
                "sample_vid_grid": sample_flow,
                "sample_vid_conf": sample_conf,
                "real_vid_grid": enc["flow"],
                "real_vid_conf": enc["conf"],
            }
            if decode:
                dec = self.lfae.apply(lv, cond_video[:, tc - 1],
                                      sample_flow[:, tc:],
                                      _pred_conf(sample_conf, tc),
                                      method=LFAE.decode_flows)
                out["sample_out_vid"] = jnp.concatenate(
                    [cond_video.astype(dec["out_vid"].dtype), dec["out_vid"]],
                    axis=1)
                out["sample_warped_vid"] = jnp.concatenate(
                    [cond_video.astype(dec["warped_vid"].dtype),
                     dec["warped_vid"]], axis=1)
            return out

        sharded = jax.jit(jax.shard_map(
            local_body, mesh=mesh,
            in_specs=(rep, rep, rep, data), out_specs=data,
            check_vma=False,
        ))

        def sampler(key, cond_video):
            assert cond_video.shape[0] % n_data == 0, (
                f"batch {cond_video.shape[0]} must divide mesh data axis "
                f"{n_data}")
            return sharded(lfae_variables, unet_variables, key, cond_video)

        return sampler

    def make_spatial_sampler(self, lfae_variables, unet_variables, mesh,
                             decode: bool = True, data_axis: str = "data",
                             spatial_axis: str = "model"):
        """Spatially-partitioned (sequence-parallel) sampler.

        The DDIM denoise stage — ~88% of sampling time and the activation-
        memory peak at high resolutions — runs as ONE GSPMD program with
        every UNet input/output constrained to
        ``P(data_axis, None, spatial_axis)``: batch over the mesh's data
        axis AND the latent H axis over the model axis. XLA's SPMD
        partitioner inserts the halo exchanges (3x3/7x7 convs, shifted-
        window rolls) and statistics all-reduces (Group/LayerNorm spans
        the sharded H) over ICI. This is the TPU-native scaling axis the
        reference lacks entirely (its only "model parallelism" is a manual
        2-GPU stage split, VideoFlowDiffusion_multi_w_ref_u22.py:176,213):
        it lets one sample's UNet state exceed a single chip's HBM
        (128px+ configs, long pred windows).

        Kernel fusion is KEPT for the attention layers: on TPU the fused
        STW/temporal pallas layers run as shard_map islands inside the
        GSPMD program (`pallas_stw.spatial_shard_scope`) — each shard
        launches its own kernel on its local H slab, with the shifted-
        window H-roll implemented as a ppermute halo exchange and the
        Swin masks pre-sharded over the H-window axis (all_gather
        fallback for shard-unaligned shapes). Only the resnet GN+SiLU
        fusion falls back to the XLA path (GSPMD inserts the conv halos
        and GroupNorm all-reduces there). EXTDM_SPATIAL_FUSED=0 restores
        the round-1 all-XLA behavior. Use `make_sharded_sampler` when
        pure batch parallelism fits.
        LFAE encode/decode stay batch-parallel via shard_map (per-frame
        2D convs; the pallas warp kernel runs per-shard unchanged).

        Returns fn(key, cond_video) -> same dict as `make_sampler`.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from extdm_tpu.ops import pallas_resnet, pallas_stw

        cfg = self.cfg
        tc, tp = cfg.cond_frames, cfg.pred_frames
        n_data = mesh.shape.get(data_axis, 1)
        n_sp = mesh.shape.get(spatial_axis, 1)

        def _sharding(ndim):
            spec = [None] * ndim
            if n_data > 1:
                spec[0] = data_axis
            # (B, T, H, W, C) activations: H is dim 2
            if ndim >= 4 and n_sp > 1:
                spec[2] = spatial_axis
            return NamedSharding(mesh, P(*spec))

        def cons(x):
            if x is None:
                return None
            return jax.lax.with_sharding_constraint(x, _sharding(x.ndim))

        @jax.jit
        def ddim(uv, key, x_cond, fea):
            # the `with` body runs at trace time: attention layers keep
            # their fused kernels as shard_map islands (TPU), everything
            # else takes the XLA module path that GSPMD partitions.
            if pallas_stw.enabled():
                stw_cm = pallas_stw.spatial_shard_scope(
                    mesh, data_axis=data_axis, spatial_axis=spatial_axis)
            else:
                stw_cm = pallas_stw.inference_only_scope()
            with stw_cm, pallas_resnet.inference_only_scope():
                x_cond = cons(x_cond)
                fea = cons(fea)
                cache = self.cond_cache(uv, x_cond, fea)
                if cache is not None:
                    cache = jax.tree_util.tree_map(cons, cache)
                base = self.denoise_fn(uv, cache)

                def denoise(x, t, cond_frames, cond_fea):
                    # re-assert the sharding every DDIM step so the scan
                    # carry stays partitioned instead of drifting to
                    # whatever GSPMD propagates through the scan
                    out = base(cons(x), t, cons(cond_frames),
                               cons(cond_fea) if cond_fea is not None else None)
                    return cons(out)

                return self.diffusion.sample(denoise, key, x_cond, tp, fea)

        # encode / finalize: batch-parallel shard_map (pallas warp kernel
        # sees local shapes; these stages have no cross-H coupling worth
        # partitioning)
        rep, data = P(), P(data_axis)

        def encode_body(lv, cond_video):
            enc = self.lfae.apply(lv, cond_video, tc, method=LFAE.encode_video)
            fea = None
            if cfg.use_ref_features:
                fea = self.lfae.apply(lv, cond_video, tc, tp,
                                      method=LFAE.ref_features)
            return enc, fea, self.latents_from_encode(enc)

        def finalize_body(lv, cond_video, enc_flow, enc_conf, pred):
            sample_flow = jnp.concatenate(
                [enc_flow, self.flow_from_pred(pred)], axis=1)
            sample_conf = None
            if enc_conf is not None:
                sample_conf = jnp.concatenate(
                    [enc_conf, (pred[..., 2:3] + 1.0) * 0.5], axis=1)
            out = {
                "sample_vid_grid": sample_flow,
                "sample_vid_conf": sample_conf,
                "real_vid_grid": enc_flow,
                "real_vid_conf": enc_conf,
            }
            if decode:
                dec = self.lfae.apply(lv, cond_video[:, tc - 1],
                                      sample_flow[:, tc:],
                                      _pred_conf(sample_conf, tc),
                                      method=LFAE.decode_flows)
                out["sample_out_vid"] = jnp.concatenate(
                    [cond_video.astype(dec["out_vid"].dtype), dec["out_vid"]],
                    axis=1)
                out["sample_warped_vid"] = jnp.concatenate(
                    [cond_video.astype(dec["warped_vid"].dtype),
                     dec["warped_vid"]], axis=1)
            return out

        encode = jax.jit(jax.shard_map(
            encode_body, mesh=mesh, in_specs=(rep, data),
            out_specs=(data, data, data), check_vma=False))
        finalize = jax.jit(jax.shard_map(
            finalize_body, mesh=mesh,
            in_specs=(rep, data, data, data, data), out_specs=data,
            check_vma=False))

        def sampler(key, cond_video):
            assert cond_video.shape[0] % n_data == 0, (
                f"batch {cond_video.shape[0]} must divide mesh "
                f"{data_axis} axis {n_data}")
            enc, fea, x_cond = encode(lfae_variables, cond_video)
            pred = ddim(unet_variables, key, x_cond, fea)
            return finalize(lfae_variables, cond_video, enc["flow"],
                            enc["conf"], pred)

        return sampler

    def sample_video(
        self,
        lfae_variables,
        unet_variables,
        key: jax.Array,
        cond_video: Array,
        decode: bool = True,
    ) -> Dict[str, Array]:
        """cond_video: (B, tc, H, W, C). Returns dict with sampled latents
        and (optionally) decoded pixels for the full tc+tp window
        (ref sample_one_video :415-510)."""
        cfg = self.cfg
        tc, tp = cfg.cond_frames, cfg.pred_frames
        assert cond_video.shape[1] == tc

        enc = self.lfae.apply(lfae_variables, cond_video, tc, method=LFAE.encode_video)
        fea = None
        if cfg.use_ref_features:
            fea = self.lfae.apply(lfae_variables, cond_video, tc, tp,
                                  method=LFAE.ref_features)
        x_cond = self.latents_from_encode(enc)

        cache = self.cond_cache(unet_variables, x_cond, fea)
        pred = self.diffusion.sample(
            self.denoise_fn(unet_variables, cache), key, x_cond, tp, fea
        )
        sample_flow = jnp.concatenate([enc["flow"], self.flow_from_pred(pred)], axis=1)
        sample_conf = None
        if enc["conf"] is not None:
            sample_conf = jnp.concatenate(
                [enc["conf"], (pred[..., 2:3] + 1.0) * 0.5], axis=1
            )
        out = {
            "sample_vid_grid": sample_flow,
            "sample_vid_conf": sample_conf,
            "real_vid_grid": enc["flow"],
            "real_vid_conf": enc["conf"],
        }
        if decode:
            # pred-frames-only decode + real cond pixels (see make_sampler)
            ref_img = cond_video[:, tc - 1]
            dec = self.lfae.apply(lfae_variables, ref_img, sample_flow[:, tc:],
                                  _pred_conf(sample_conf, tc),
                                  method=LFAE.decode_flows)
            out["sample_out_vid"] = jnp.concatenate(
                [cond_video.astype(dec["out_vid"].dtype), dec["out_vid"]], axis=1)
            out["sample_warped_vid"] = jnp.concatenate(
                [cond_video.astype(dec["warped_vid"].dtype), dec["warped_vid"]], axis=1)
        return out
