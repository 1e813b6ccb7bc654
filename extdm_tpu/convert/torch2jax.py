"""PyTorch checkpoint -> flax parameter conversion.

Covers the reference checkpoint formats (SURVEY §5): AE checkpoints
({generator, region_predictor, bg_predictor, optimizer, example, epoch}),
DM checkpoints ({diffusion, ...}), and the pretrained perceptual nets
(torchvision VGG19, lpips AlexNet, FVD I3D).

All converters take plain state-dict-like mappings (str -> numpy array),
so `torch.load(..., map_location='cpu')` results can be fed directly after
`{k: v.numpy() for k, v in sd.items()}`.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


# --- primitive weight layout transforms ----------------------------------------
def conv2d_kernel(w: Array) -> Array:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_kernel(w: Array) -> Array:
    """torch OIDHW -> flax DHWIO."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def conv_transpose3d_kernel(w: Array) -> Array:
    """torch ConvTranspose3d IODHW -> flax ConvTranspose DHWIO with flipped
    spatial dims (flax conv_transpose correlates, torch's transpose conv
    convolves the flipped kernel)."""
    w = np.transpose(w, (2, 3, 4, 0, 1))  # DHW, I, O
    return w[::-1, ::-1, ::-1]


def linear_kernel(w: Array) -> Array:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def bn_variables(sd: StateDict, prefix: str) -> Dict[str, Dict[str, Array]]:
    return {
        "params": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        "stats": {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    }


class VariablesBuilder:
    """Accumulates params/batch_stats trees by path strings 'a/b/c'."""

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def _set(self, root, path: str, leaf_key: str, value):
        node = root
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leaf_key] = np.asarray(value)

    def conv2d(self, path: str, sd: StateDict, prefix: str, bias: bool = True):
        self._set(self.params, path, "kernel", conv2d_kernel(sd[f"{prefix}.weight"]))
        if bias and f"{prefix}.bias" in sd:
            self._set(self.params, path, "bias", sd[f"{prefix}.bias"])

    def conv3d(self, path: str, sd: StateDict, prefix: str, bias: bool = True):
        self._set(self.params, path, "kernel", conv3d_kernel(sd[f"{prefix}.weight"]))
        if bias and f"{prefix}.bias" in sd:
            self._set(self.params, path, "bias", sd[f"{prefix}.bias"])

    def linear(self, path: str, sd: StateDict, prefix: str, bias: bool = True):
        self._set(self.params, path, "kernel", linear_kernel(sd[f"{prefix}.weight"]))
        if bias and f"{prefix}.bias" in sd:
            self._set(self.params, path, "bias", sd[f"{prefix}.bias"])

    def bn(self, path: str, sd: StateDict, prefix: str):
        self._set(self.params, path, "scale", sd[f"{prefix}.weight"])
        self._set(self.params, path, "bias", sd[f"{prefix}.bias"])
        self._set(self.stats, path, "mean", sd[f"{prefix}.running_mean"])
        self._set(self.stats, path, "var", sd[f"{prefix}.running_var"])

    def raw(self, path: str, leaf: str, value):
        self._set(self.params, path, leaf, value)

    def variables(self) -> Dict[str, Any]:
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# --- LFAE blocks ------------------------------------------------------------------
def _convert_same_block(b: VariablesBuilder, path: str, sd: StateDict, prefix: str):
    b.conv2d(f"{path}/conv/conv", sd, f"{prefix}.conv")
    b.bn(f"{path}/norm/bn", sd, f"{prefix}.norm")


def _convert_hourglass(b: VariablesBuilder, path: str, sd: StateDict, prefix: str,
                       num_blocks: int):
    for i in range(num_blocks):
        _convert_same_block(b, f"{path}/encoder/down{i}", sd, f"{prefix}.encoder.down_blocks.{i}")
    for j in range(num_blocks):
        _convert_same_block(b, f"{path}/decoder/up{j}", sd, f"{prefix}.decoder.up_blocks.{j}")


def convert_region_predictor(sd: StateDict, num_blocks: int = 5) -> Dict[str, Any]:
    b = VariablesBuilder()
    _convert_hourglass(b, "predictor", sd, "predictor", num_blocks)
    b.conv2d("regions/conv", sd, "regions")
    if "jacobian.weight" in sd:
        b.conv2d("jacobian", sd, "jacobian")
    # down.weight (antialias gaussian) is a fixed buffer — recomputed here.
    return b.variables()


def convert_bg_predictor(sd: StateDict, num_blocks: int = 5) -> Dict[str, Any]:
    b = VariablesBuilder()
    for i in range(num_blocks):
        _convert_same_block(b, f"encoder/down{i}", sd, f"encoder.down_blocks.{i}")
    if "fc.weight" in sd:
        b.linear("fc", sd, "fc")
    return b.variables()


def convert_generator(sd: StateDict, num_down_blocks: int = 2,
                      num_bottleneck_blocks: int = 6,
                      flow_num_blocks: int = 5) -> Dict[str, Any]:
    b = VariablesBuilder()
    _convert_same_block(b, "first", sd, "first")
    for i in range(num_down_blocks):
        _convert_same_block(b, f"down_blocks_{i}", sd, f"down_blocks.{i}")
        _convert_same_block(b, f"up_blocks_{i}", sd, f"up_blocks.{i}")
    for i in range(num_bottleneck_blocks):
        p = f"bottleneck_{i}"
        rp = f"bottleneck.r{i}"
        b.conv2d(f"{p}/conv1/conv", sd, f"{rp}.conv1")
        b.conv2d(f"{p}/conv2/conv", sd, f"{rp}.conv2")
        b.bn(f"{p}/norm1/bn", sd, f"{rp}.norm1")
        b.bn(f"{p}/norm2/bn", sd, f"{rp}.norm2")
    b.conv2d("final/conv", sd, "final")
    pf = "pixelwise_flow_predictor"
    if any(k.startswith(pf) for k in sd):
        _convert_hourglass(b, f"{pf}/hourglass", sd, f"{pf}.hourglass", flow_num_blocks)
        b.conv2d(f"{pf}/mask/conv", sd, f"{pf}.mask")
        if f"{pf}.occlusion.weight" in sd:
            b.conv2d(f"{pf}/occlusion/conv", sd, f"{pf}.occlusion")
    return b.variables()


def convert_lfae_checkpoint(ckpt: Mapping[str, StateDict], flow_params: dict) -> Dict[str, Any]:
    """Reference AE checkpoint -> variables for extdm_tpu.models.dm.LFAE."""
    rp = convert_region_predictor(
        ckpt["region_predictor"], flow_params["region_predictor_params"]["num_blocks"]
    )
    bg = convert_bg_predictor(
        ckpt["bg_predictor"], flow_params["bg_predictor_params"]["num_blocks"]
    )
    gp = flow_params["generator_params"]
    gen = convert_generator(
        ckpt["generator"],
        gp.get("num_down_blocks", 2),
        gp.get("num_bottleneck_blocks", 6),
        gp["pixelwise_flow_predictor_params"]["num_blocks"],
    )
    return {
        "params": {
            "region_predictor": rp["params"],
            "bg_predictor": bg["params"],
            "generator": gen["params"],
        },
        "batch_stats": {
            "region_predictor": rp.get("batch_stats", {}),
            "bg_predictor": bg.get("batch_stats", {}),
            "generator": gen.get("batch_stats", {}),
        },
    }


# --- perceptual nets -----------------------------------------------------------------
_VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]


def convert_vgg19(sd: StateDict) -> Dict[str, Any]:
    """torchvision vgg19().features state dict -> Vgg19Features params.
    Accepts keys like 'features.0.weight' or '0.weight'."""
    def get(i, leaf):
        for k in (f"features.{i}.{leaf}", f"{i}.{leaf}"):
            if k in sd:
                return sd[k]
        raise KeyError(f"vgg19 layer {i} {leaf} not found")

    params = {}
    for j, i in enumerate(_VGG19_CONV_IDX):
        params[f"conv{j}"] = {
            "kernel": conv2d_kernel(get(i, "weight")),
            "bias": get(i, "bias"),
        }
    return {"params": params}


_ALEXNET_CONV_IDX = [0, 3, 6, 8, 10]


def convert_lpips(sd: StateDict) -> Dict[str, Any]:
    """lpips.LPIPS(net='alex') state dict -> LPIPS params."""
    params: Dict[str, Any] = {"net": {}}
    for j, i in enumerate(_ALEXNET_CONV_IDX):
        for prefix in (f"net.slice{j+1}.{i}", f"net.features.{i}"):
            if f"{prefix}.weight" in sd:
                params["net"][f"conv{j}"] = {
                    "kernel": conv2d_kernel(sd[f"{prefix}.weight"]),
                    "bias": sd[f"{prefix}.bias"],
                }
                break
        else:
            raise KeyError(f"alexnet conv {j} not found in lpips state dict")
    for j in range(5):
        w = sd[f"lin{j}.model.1.weight"]  # (1, C, 1, 1)
        params[f"lin{j}"] = w.reshape(w.shape[1], 1)
    return {"params": params}


def convert_i3d(sd: StateDict) -> Dict[str, Any]:
    """pytorch_i3d-style InceptionI3d state dict -> flax InceptionI3d vars."""
    b = VariablesBuilder()

    def unit(path, prefix, bn=True, bias=False):
        b.conv3d(f"{path}/conv3d", sd, f"{prefix}.conv3d", bias=bias)
        if bn:
            b.bn(f"{path}/bn", sd, f"{prefix}.bn")

    unit("Conv3d_1a_7x7", "Conv3d_1a_7x7")
    unit("Conv3d_2b_1x1", "Conv3d_2b_1x1")
    unit("Conv3d_2c_3x3", "Conv3d_2c_3x3")
    for name in ["Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                 "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"]:
        for branch in ["b0", "b1a", "b1b", "b2a", "b2b", "b3b"]:
            unit(f"{name}/{branch}", f"{name}.{branch}")
    unit("logits", "logits", bn=False, bias=True)
    return b.variables()


# --- diffusion UNet (DenoiseNet_..._ada_u22) ----------------------------------------
def _convert_resnet_block(b: VariablesBuilder, path: str, sd: StateDict,
                          prefix: str):
    """ResnetBlock (ref ..._ada_u22.py:257-279): optional FiLM mlp, two
    conv+GN blocks, optional 1x1x1 res_conv."""
    if f"{prefix}.mlp.1.weight" in sd:
        b.linear(f"{path}/mlp", sd, f"{prefix}.mlp.1")
    for blk in ("block1", "block2"):
        b.conv3d(f"{path}/{blk}/proj/Conv_0", sd, f"{prefix}.{blk}.proj")
        b.raw(f"{path}/{blk}/norm", "scale", sd[f"{prefix}.{blk}.norm.weight"])
        b.raw(f"{path}/{blk}/norm", "bias", sd[f"{prefix}.{blk}.norm.bias"])
    if f"{prefix}.res_conv.weight" in sd:
        b.conv3d(f"{path}/res_conv", sd, f"{prefix}.res_conv")


def _convert_stw_layer(b: VariablesBuilder, path: str, sd: StateDict,
                       prefix: str):
    """Residual(PreNorm(STWAttentionLayer)) (ref :621-682). The
    relative_position_index buffer is recomputed trace-time here."""
    b.raw(f"{path}/norm", "gamma", sd[f"{prefix}.fn.norm.gamma"].reshape(-1))
    a = f"{prefix}.fn.fn.attn"
    b.raw(f"{path}/fn/attn", "relative_position_bias_table",
          sd[f"{a}.relative_position_bias_table"])
    b.linear(f"{path}/fn/attn/qkv", sd, f"{a}.qkv")
    b.linear(f"{path}/fn/attn/proj/Dense_0", sd, f"{a}.proj")


def _convert_temporal_layer(b: VariablesBuilder, path: str, sd: StateDict,
                            prefix: str):
    """Residual(PreNorm(EinopsToAndFrom(AttentionLayer))) (ref :426-450)."""
    b.raw(f"{path}/norm", "gamma", sd[f"{prefix}.fn.norm.gamma"].reshape(-1))
    inner = f"{prefix}.fn.fn.fn"
    b.raw(f"{path}/fn/norm", "scale", sd[f"{inner}.norm.weight"])
    b.raw(f"{path}/fn/norm", "bias", sd[f"{inner}.norm.bias"])
    b.linear(f"{path}/fn/attn/to_qkv", sd, f"{inner}.attn.to_qkv")
    b.linear(f"{path}/fn/attn/to_out", sd, f"{inner}.attn.to_out")


def _convert_adaptor(b: VariablesBuilder, path: str, sd: StateDict,
                     prefix: str):
    """MotionAdaptor (ref :829-860): predictor + extrapolators + T-major
    Tmodulator + fuser."""
    b.raw(f"{path}/adaptors/predictor_norm", "gamma",
          sd[f"{prefix}.adaptors.predictor.fn.norm.gamma"].reshape(-1))
    b.conv3d(f"{path}/adaptors/predictor/Conv_0", sd,
             f"{prefix}.adaptors.predictor.fn.fn")
    i = 0
    while f"{prefix}.adaptors.extrapolators.{i}.fn.weight" in sd:
        b.conv3d(f"{path}/adaptors/extrapolator{i}", sd,
                 f"{prefix}.adaptors.extrapolators.{i}.fn", bias=False)
        i += 1
    b.conv2d(f"{path}/Tmodulator", sd, f"{prefix}.Tmodulator")
    b.raw(f"{path}/fuser_norm", "gamma",
          sd[f"{prefix}.fuser.norm.gamma"].reshape(-1))
    b.conv3d(f"{path}/fuser/Conv_0", sd, f"{prefix}.fuser.fn")


def convert_unet3d(sd: StateDict, latent_channels: int = 3,
                   path1: bool = False) -> Dict[str, Any]:
    """Reference Unet3D (DenoiseNet_..._ada_u22.py:1009-1158) state dict ->
    extdm_tpu.models.dm.unet3d.Unet3D params.

    The reference concatenates cond features onto the latent channels and
    runs one 259-ch init conv (:1060, wrapper passes channels=3+256); our
    UNet splits it into init_conv (latent, with bias) + init_conv_cond
    (features, no bias) so the cond half hoists out of the DDIM scan —
    the split weights sum to the identical convolution.
    """
    b = VariablesBuilder()
    lc = latent_channels

    w = sd["init_conv.weight"]  # (init_dim, lc+cond_dim, 1, k, k)
    b.raw("init_conv/Conv_0", "kernel", conv3d_kernel(w[:, :lc]))
    b.raw("init_conv/Conv_0", "bias", sd["init_conv.bias"])
    if w.shape[1] > lc:
        b.raw("init_conv_cond", "kernel", conv3d_kernel(w[:, lc:]))

    b.raw("time_rel_pos_bias", "relative_attention_bias",
          sd["time_rel_pos_bias.relative_attention_bias.weight"])
    if path1:
        # THW bias table + alpha/beta head mix exist in every reference
        # checkpoint but are only USED (and only exist in our param tree)
        # on the path=1 trace (ref :1192-1221)
        b.raw("rel_pos_bias_thw", "relative_attention_bias",
              sd["rel_pos_bias_thw.relative_attention_bias.weight"])
        for extra in ("alpha", "beta"):
            b.params[extra] = np.asarray(sd[extra])

    _convert_temporal_layer(b, "init_temporal_attn", sd, "init_temporal_attn")
    if "cond_temporal_attn.fn.norm.gamma" in sd:
        _convert_temporal_layer(b, "cond_temporal_attn", sd, "cond_temporal_attn")
        _convert_adaptor(b, "cond_adaptor", sd, "cond_adaptor")

    b.linear("time_mlp_0", sd, "time_mlp.1")
    b.linear("time_mlp_1", sd, "time_mlp.3")

    n_levels = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("downs."))
    for i in range(n_levels):
        _convert_resnet_block(b, f"down{i}_block1", sd, f"downs.{i}.0")
        _convert_stw_layer(b, f"down{i}_stw1", sd, f"downs.{i}.1")
        _convert_resnet_block(b, f"down{i}_block2", sd, f"downs.{i}.2")
        _convert_stw_layer(b, f"down{i}_stw2", sd, f"downs.{i}.3")
        if f"downs.{i}.4.Tmodulator.weight" in sd:
            _convert_adaptor(b, f"down{i}_adaptor", sd, f"downs.{i}.4")
        _convert_temporal_layer(b, f"down{i}_tattn", sd, f"downs.{i}.5")
        if f"downs.{i}.6.weight" in sd:
            b.conv3d(f"down{i}_downsample/Conv_0", sd, f"downs.{i}.6")

    _convert_resnet_block(b, "mid_block1", sd, "mid_block1")
    _convert_stw_layer(b, "mid_attn1", sd, "mid_attn1")
    _convert_resnet_block(b, "mid_block2", sd, "mid_block2")
    _convert_stw_layer(b, "mid_attn2", sd, "mid_attn2")
    if "mid_adaptor.Tmodulator.weight" in sd:
        _convert_adaptor(b, "mid_adaptor", sd, "mid_adaptor")

    for i in range(n_levels):
        _convert_resnet_block(b, f"up{i}_block1", sd, f"ups.{i}.0")
        _convert_stw_layer(b, f"up{i}_stw1", sd, f"ups.{i}.1")
        _convert_resnet_block(b, f"up{i}_block2", sd, f"ups.{i}.2")
        _convert_stw_layer(b, f"up{i}_stw2", sd, f"ups.{i}.3")
        if f"ups.{i}.4.Tmodulator.weight" in sd:
            _convert_adaptor(b, f"up{i}_adaptor", sd, f"ups.{i}.4")
        _convert_temporal_layer(b, f"up{i}_tattn", sd, f"ups.{i}.5")
        if f"ups.{i}.6.weight" in sd:
            w = sd[f"ups.{i}.6.weight"]
            b.raw(f"up{i}_upsample/conv", "kernel", conv_transpose3d_kernel(w))
            b.raw(f"up{i}_upsample/conv", "bias", sd[f"ups.{i}.6.bias"])

    _convert_resnet_block(b, "final_block", sd, "final_conv.0")
    b.conv3d("final_conv", sd, "final_conv.1")
    _convert_resnet_block(b, "occlusion_block", sd, "occlusion_map.0")
    b.conv3d("occlusion_conv", sd, "occlusion_map.1")
    return b.variables()["params"]


def convert_dm_checkpoint(diffusion_sd: StateDict,
                          latent_channels: int = 3,
                          path1: bool = False) -> Dict[str, Any]:
    """Reference DM checkpoint ('diffusion' entry: GaussianDiffusion.state_dict(),
    scripts/DM/train.py:404-412) -> our Unet3D params. Diffusion schedule
    buffers (betas, alphas_cumprod, ...) are recomputed from config at
    trace time, so only `denoise_fn.*` keys are consumed."""
    unet_sd = {k[len("denoise_fn."):]: v for k, v in diffusion_sd.items()
               if k.startswith("denoise_fn.")}
    assert unet_sd, "no denoise_fn.* keys — not a GaussianDiffusion state dict?"
    return convert_unet3d(unet_sd, latent_channels, path1=path1)
