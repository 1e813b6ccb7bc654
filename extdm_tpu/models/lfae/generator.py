"""LFAE Generator (Johnson architecture) with flow-warped features.

Semantics match /root/reference/model/LFAE/generator.py:16-206. Exposed as
three entry points mirroring the reference API:
- `__call__(source, driving_params, source_params, bg_params)`: full
  forward (predict flow + decode) — stage-1 training / encode path.
- method="bottle": encoder features only (`forward_bottle`).
- method="flow": decode with externally supplied flow/occlusion
  (`forward_with_flow`) — the DM decode path.
- method="encode_flow": predict flow/occlusion only (no decode) — a
  TPU-native addition: the DM *training* path only needs the latents, so
  skipping the bottleneck+decoder saves ~60% of stage-1 FLOPs per frame.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from extdm_tpu.models.lfae.pixelwise_flow import PixelwiseFlowPredictor
from extdm_tpu.nn.layers import Conv, DownBlock2d, ResBlock2d, SameBlock2d, UpBlock2d
from extdm_tpu.ops.resize import interpolate_bilinear
from extdm_tpu.ops.warp import grid_sample


def deform_input(inp: jnp.ndarray, optical_flow: jnp.ndarray) -> jnp.ndarray:
    """Warp (B, H, W, C) by a (B, h, w, 2) flow grid, resizing the grid
    bilinearly (align_corners=False) if resolutions differ (ref :63-71)."""
    h, w = inp.shape[1:3]
    if optical_flow.shape[1:3] != (h, w):
        optical_flow = interpolate_bilinear(optical_flow, (h, w))
    return grid_sample(inp, optical_flow)


class Generator(nn.Module):
    num_regions: int
    num_channels: int = 3
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    num_bottleneck_blocks: int = 6
    skips: bool = True
    revert_axis_swap: bool = True
    pixelwise_flow_predictor_params: Optional[dict] = None
    train: bool = True
    dtype: Any = None

    def setup(self):
        if self.pixelwise_flow_predictor_params is not None:
            self.pixelwise_flow_predictor = PixelwiseFlowPredictor(
                num_regions=self.num_regions,
                num_channels=self.num_channels,
                revert_axis_swap=self.revert_axis_swap,
                train=self.train,
                dtype=self.dtype,
                **self.pixelwise_flow_predictor_params,
            )
        else:
            self.pixelwise_flow_predictor = None

        self.first = SameBlock2d(self.block_expansion, kernel_size=7, train=self.train, dtype=self.dtype)
        down_blocks = []
        up_blocks = []
        for i in range(self.num_down_blocks):
            out_f = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            down_blocks.append(DownBlock2d(out_f, train=self.train, dtype=self.dtype))
            out_f_up = min(
                self.max_features, self.block_expansion * (2 ** (self.num_down_blocks - i - 1))
            )
            up_blocks.append(UpBlock2d(out_f_up, train=self.train, dtype=self.dtype))
        self.down_blocks = down_blocks
        self.up_blocks = up_blocks
        self.bottleneck = [
            ResBlock2d(train=self.train, dtype=self.dtype) for _ in range(self.num_bottleneck_blocks)
        ]
        # dtype matters: without it the 7x7 pixel head promotes the whole
        # decoder tail to f32 (measured ~10 ms/decode at KTH batch 32);
        # the f32 cast for sigmoid happens at the call site.
        self.final = Conv(self.num_channels, (7, 7), dtype=self.dtype)

    # --- pieces -----------------------------------------------------------
    def _encode(self, source_image):
        out = self.first(source_image)
        skips = [out]
        for blk in self.down_blocks:
            out = blk(out)
            skips.append(out)
        return out, skips

    def _apply_optical(self, input_skip, motion_params, input_previous=None,
                       deformed=None):
        """(ref apply_optical :74-93). `deformed` short-circuits the warp
        with a precomputed deform_input(input_skip, optical_flow) — used to
        share one gather kernel across same-flow warps."""
        if motion_params is None:
            return input_previous if input_previous is not None else input_skip
        occlusion = motion_params.get("occlusion_map")
        if deformed is None:
            deformed = deform_input(input_skip, motion_params["optical_flow"])
        if occlusion is not None:
            if deformed.shape[1:3] != occlusion.shape[1:3]:
                occlusion = interpolate_bilinear(occlusion, deformed.shape[1:3])
            # blend in the promoted stream dtype: a f32 occlusion map would
            # otherwise promote every post-warp bf16 activation to f32
            # (measured ~6 ms/decode of converts at KTH batch 32). The final
            # source blend (f32 sigmoid output) still promotes to f32.
            if input_previous is not None:
                bd = jnp.promote_types(deformed.dtype, input_previous.dtype)
                occlusion = occlusion.astype(bd)
                deformed = (deformed.astype(bd) * occlusion
                            + input_previous.astype(bd) * (1 - occlusion))
            else:
                deformed = deformed * occlusion.astype(deformed.dtype)
        return deformed

    def _warp_skip0_and_source(self, skips, source_image, motion_params):
        """One gather kernel for the two full-resolution warps that share
        the same flow (skips[0] C=64 and the source pixels C=3): the fused
        warp's cost is the per-pixel one-hot weight build, which is
        channel-independent, so batching channels is ~2x on-device
        (25.6+25.6 -> ~26 ms at KTH batch-32 decode)."""
        flow = motion_params["optical_flow"]
        src = source_image.astype(skips[0].dtype)
        cat = jnp.concatenate([skips[0], src], axis=-1)
        d = deform_input(cat, flow)
        c0 = skips[0].shape[-1]
        return d[..., :c0], d[..., c0:]

    def _decode(self, out, skips, source_image, motion_params, output_dict):
        deformed_skip0 = deformed_source = None
        if self.skips and motion_params is not None:
            deformed_skip0, deformed_source = self._warp_skip0_and_source(
                skips, source_image, motion_params)
            # the reference's `deformed` output (ref :151,:178) is this same
            # un-occluded source warp — reuse it instead of re-gathering.
            output_dict["deformed"] = deformed_source
        out = self._apply_optical(out, motion_params)
        for blk in self.bottleneck:
            out = blk(out)
        for i, blk in enumerate(self.up_blocks):
            if self.skips:
                out = self._apply_optical(skips[-(i + 1)], motion_params, input_previous=out)
            out = blk(out)
        if self.skips:
            out = self._apply_optical(skips[0], motion_params, input_previous=out,
                                      deformed=deformed_skip0)
        out = nn.sigmoid(self.final(out).astype(jnp.float32))
        if self.skips:
            out = self._apply_optical(source_image, motion_params, input_previous=out,
                                      deformed=deformed_source)
        output_dict["prediction"] = out
        return output_dict

    # --- public API ---------------------------------------------------------
    def __call__(
        self,
        source_image,
        driving_region_params=None,
        source_region_params=None,
        bg_params=None,
        mode: str = "full",
        optical_flow=None,
        occlusion_map=None,
        feat=None,
        skips=None,
    ) -> Dict[str, jnp.ndarray]:
        if self.dtype is not None:
            # bf16 policy: source pixels are [0,1] with 8-bit provenance
            # (bf16 eps 2^-8 == 1/256), and keeping them f32 forces the
            # full-res source warp through the exact-precision matmul path
            # (~4x slower on the MXU).
            source_image = source_image.astype(self.dtype)
        if mode == "bottle":
            out, _ = self._encode(source_image)
            return {"bottle_neck_feat": out}

        if mode == "encode_flow":
            motion = self.pixelwise_flow_predictor(
                source_image, driving_region_params, source_region_params, bg_params
            )
            return dict(motion)

        if mode == "flow":
            motion = {"optical_flow": optical_flow, "occlusion_map": occlusion_map}
            out, skips = self._encode(source_image)
            output = {}
            if not self.skips:  # else _decode reuses its fused source warp
                output["deformed"] = deform_input(source_image, optical_flow)
            return self._decode(out, skips, source_image, motion, output)

        if mode == "encode_feats":
            # encoder features + skips for reuse across many flow decodes of
            # the SAME source (the DM decode path warps one ref frame per
            # tp flows; encoding it once instead of tp times is a TPU-native
            # saving over the reference's per-frame forward_with_flow).
            out, skips = self._encode(source_image)
            return {"feat": out, "skips": tuple(skips)}

        if mode == "flow_decode":
            # decode with externally supplied flow AND pre-encoded features
            # (from mode="encode_feats", already repeated by the caller).
            assert optical_flow is not None and feat is not None
            motion = {"optical_flow": optical_flow, "occlusion_map": occlusion_map}
            output = {}
            if not self.skips:  # else _decode reuses its fused source warp
                output["deformed"] = deform_input(source_image, optical_flow)
            return self._decode(feat, list(skips), source_image, motion, output)

        assert mode == "full"
        out, skips = self._encode(source_image)
        output: Dict[str, jnp.ndarray] = {"bottle_neck_feat": out}
        motion = None
        if self.pixelwise_flow_predictor is not None:
            motion = self.pixelwise_flow_predictor(
                source_image, driving_region_params, source_region_params, bg_params
            )
            if not self.skips:  # else _decode reuses its fused source warp
                output["deformed"] = deform_input(source_image, motion["optical_flow"])
            output["optical_flow"] = motion["optical_flow"]
            if "occlusion_map" in motion:
                output["occlusion_map"] = motion["occlusion_map"]
        return self._decode(out, skips, source_image, motion, output)
