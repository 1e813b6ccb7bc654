"""Stage-1 training wrapper: reconstruction + perceptual + equivariance.

Mirrors /root/reference/model/LFAE/model.py:141-239. One flax module so the
whole stage-1 loss (including the random TPS equivariance branch) is one
jitted graph; the reference's 3-GPU manual placement disappears — XLA
schedules everything on the mesh.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from extdm_tpu.models.lfae.bg_predictor import BGMotionPredictor
from extdm_tpu.models.lfae.generator import Generator
from extdm_tpu.models.lfae.region_predictor import RegionPredictor
from extdm_tpu.models.lfae.transform import (
    jacobian,
    random_tps,
    transform_frame,
    warp_coordinates,
)
from extdm_tpu.models.lfae.vgg import Vgg19Features
from extdm_tpu.ops.antialias import antialias_downsample
from extdm_tpu.ops.eigh2x2 import inv_2x2


class ReconstructionModel(nn.Module):
    region_predictor_cfg: dict
    bg_predictor_cfg: dict
    generator_cfg: dict
    num_regions: int
    num_channels: int = 3
    scales: Sequence[float] = (1.0, 0.5, 0.25)
    loss_weights: dict | None = None
    transform_params: dict | None = None
    train: bool = True
    dtype: Any = None

    def setup(self):
        self.region_predictor = RegionPredictor(
            num_regions=self.num_regions, train=self.train, dtype=self.dtype,
            **self.region_predictor_cfg,
        )
        self.bg_predictor = BGMotionPredictor(
            train=self.train, dtype=self.dtype, **self.bg_predictor_cfg
        )
        self.generator = Generator(
            num_regions=self.num_regions, num_channels=self.num_channels,
            train=self.train, dtype=self.dtype, **self.generator_cfg,
        )
        weights = self.loss_weights or {}
        if sum(weights.get("perceptual", [0])) != 0:
            self.vgg = Vgg19Features(dtype=self.dtype)
        else:
            self.vgg = None

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Tuple[Dict, Dict]:
        """batch: {'source': (B,H,W,C), 'driving': (B,H,W,C)} in [0,1]."""
        weights = self.loss_weights or {}
        source, driving = batch["source"], batch["driving"]

        source_params = self.region_predictor(source)
        driving_params = self.region_predictor(driving)
        bg_params = self.bg_predictor(source, driving)
        generated = dict(
            self.generator(source, driving_params, source_params, bg_params)
        )
        generated["source_region_params"] = source_params
        generated["driving_region_params"] = driving_params

        losses: Dict[str, jnp.ndarray] = {}

        percep_w = weights.get("perceptual", [])
        if self.vgg is not None and sum(percep_w) != 0:
            total = 0.0
            for scale in self.scales:
                side = min(driving.shape[1], driving.shape[2]) * scale
                if side < 16:
                    # VGG19's relu5_1 sits at stride 16: a smaller pyramid
                    # level pools down to a ZERO-size map whose mean is NaN
                    # — silently poisoning every step. Fail loudly instead.
                    raise ValueError(
                        f"perceptual scale {scale} on {driving.shape[1]}x"
                        f"{driving.shape[2]} frames gives a {side:g}px VGG "
                        f"input (< 16px); drop the scale or use larger frames")
                gen_s = antialias_downsample(generated["prediction"], scale)
                real_s = antialias_downsample(driving, scale)
                x_feats = self.vgg(gen_s)
                y_feats = self.vgg(real_s)
                for w, xf, yf in zip(percep_w, x_feats, y_feats):
                    total += w * jnp.abs(xf - jnp.asarray(yf)).mean()
            losses["perceptual"] = total

        eq_shift_w = weights.get("equivariance_shift", 0)
        eq_affine_w = weights.get("equivariance_affine", 0)
        if (eq_shift_w + eq_affine_w) != 0:
            tps_key = self.make_rng("tps")
            t = random_tps(tps_key, driving.shape[0], **(self.transform_params or {}))
            transformed_frame = transform_frame(t, driving)
            transformed_params = self.region_predictor(transformed_frame)
            generated["transformed_frame"] = transformed_frame
            generated["transformed_region_params"] = transformed_params

            if eq_shift_w != 0:
                warped_shift = warp_coordinates(t, transformed_params["shift"])
                losses["equivariance_shift"] = eq_shift_w * jnp.abs(
                    driving_params["shift"] - warped_shift
                ).mean()

            if eq_affine_w != 0:
                jac = jacobian(t, transformed_params["shift"])  # (B,K,2,2)
                affine_transformed = jac @ transformed_params["affine"]
                normed_driving = inv_2x2(driving_params["affine"])
                value = normed_driving @ affine_transformed
                if self.generator.pixelwise_flow_predictor is not None and (
                    self.generator.revert_axis_swap
                ):
                    value = value * jnp.sign(value[:, :, 0:1, 0:1])
                eye = jnp.eye(2, dtype=value.dtype)
                losses["equivariance_affine"] = eq_affine_w * jnp.abs(eye - value).mean()

        rec_w = weights.get("reconstruction", 0)
        if rec_w != 0:
            losses["reconstruction"] = rec_w * jnp.mean(
                (generated["prediction"] - driving) ** 2
            )

        return losses, generated
