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
