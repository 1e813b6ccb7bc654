"""Minimal stand-ins for packages the reference denoiser imports but this
environment lacks (rotary_embedding_torch, timm, einops_exts), so the
golden DM parity tests can instantiate the *actual* reference torch
modules from /root/reference on CPU.

Faithfulness notes:
- RotaryEmbedding mirrors rotary-embedding-torch's default config as used
  at DenoiseNet_..._ada_u22.py:1046: interleaved pair layout, theta 10000,
  partial rotation (first `dim` features), seq axis -2.
- DropPath is identity (the reference never sets drop_prob > 0).
- rearrange_many/repeat_many are thin loops over einops.
"""
from __future__ import annotations

import sys
import types

import torch
from torch import nn
from einops import rearrange, repeat


def install() -> None:
    """Register the stub modules in sys.modules (idempotent)."""
    import numpy as np

    if "skimage" not in sys.modules:
        # model/LFAE/util.py imports skimage.draw.disk for the Visualizer
        # (never touched by the parity tests)
        skimage = types.ModuleType("skimage")
        draw = types.ModuleType("skimage.draw")
        draw.disk = lambda *a, **k: (np.zeros(0, int), np.zeros(0, int))
        skimage.draw = draw
        sys.modules["skimage"] = skimage
        sys.modules["skimage.draw"] = draw

    if "torchvision" not in sys.modules:
        # the DM wrapper imports torchvision.models only for its DEAD Vgg19
        # copy (VideoFlowDiffusion_multi_w_ref_u22.py:18-141, never
        # instantiated) — raise if actually used
        def _unavailable(*a, **k):
            raise ModuleNotFoundError("torchvision stub: not available")

        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.vgg19 = _unavailable
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models

    if "rotary_embedding_torch" in sys.modules:
        return

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            inv_freq = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv_freq, persistent=False)
            self.dim = dim

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            assert seq_dim in (-2, t.ndim - 2)
            n = t.shape[-2]
            freqs = torch.einsum(
                "i,j->ij", torch.arange(n, dtype=torch.float32), self.inv_freq)
            freqs = torch.repeat_interleave(freqs, 2, dim=-1)  # (n, dim)
            rot = freqs.shape[-1]
            t_l, t_r = t[..., :rot], t[..., rot:]
            x = t_l.reshape(*t_l.shape[:-1], -1, 2)
            x1, x2 = x.unbind(-1)
            half = torch.stack((-x2, x1), dim=-1).reshape(t_l.shape)
            t_l = t_l * freqs.cos() + half * freqs.sin()
            return torch.cat((t_l, t_r), dim=-1)

    m_rot = types.ModuleType("rotary_embedding_torch")
    m_rot.RotaryEmbedding = RotaryEmbedding
    sys.modules["rotary_embedding_torch"] = m_rot

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            assert drop_prob == 0.0, "stub supports identity DropPath only"

        def forward(self, x):
            return x

    m_timm = types.ModuleType("timm")
    m_models = types.ModuleType("timm.models")
    m_layers = types.ModuleType("timm.models.layers")
    m_layers.DropPath = DropPath
    m_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    m_timm.models = m_models
    m_models.layers = m_layers
    sys.modules["timm"] = m_timm
    sys.modules["timm.models"] = m_models
    sys.modules["timm.models.layers"] = m_layers

    def rearrange_many(tensors, pattern, **kwargs):
        return tuple(rearrange(t, pattern, **kwargs) for t in tensors)

    def repeat_many(tensors, pattern, **kwargs):
        return tuple(repeat(t, pattern, **kwargs) for t in tensors)

    def check_shape(t, pattern, **kwargs):
        return rearrange(t, f"{pattern} -> {pattern}", **kwargs)

    m_ee = types.ModuleType("einops_exts")
    m_ee.rearrange_many = rearrange_many
    m_ee.repeat_many = repeat_many
    m_ee.check_shape = check_shape
    sys.modules["einops_exts"] = m_ee

    # tqdm is present in most images, but guard anyway (Diffusion.py uses it)
    try:
        import tqdm  # noqa: F401
    except ImportError:  # pragma: no cover
        m_tqdm = types.ModuleType("tqdm")
        m_tqdm.tqdm = lambda it, **kw: it
        sys.modules["tqdm"] = m_tqdm
