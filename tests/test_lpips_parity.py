"""Golden parity for LPIPS (AlexNet backbone) + convert_lpips.

The external `lpips` package isn't in this image, so the torch side here
reimplements its net='alex', spatial=True forward exactly (scaling layer
constants, torchvision alexnet.features slice layout, normalize_tensor
with eps OUTSIDE the sqrt, non-negative 1x1 lin heads, bilinear
align_corners=False upsample, per-sample spatial mean — lpips/lpips.py
upstream; reference call sites /root/reference/metrics/calculate_lpips.py:9-23)
with random weights in the package's state-dict layout, converted via
`convert_lpips`, and compared against our `LPIPS` module.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from extdm_tpu.convert.torch2jax import convert_lpips  # noqa: E402
from extdm_tpu.metrics.lpips import LPIPS  # noqa: E402

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).reshape(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).reshape(1, 3, 1, 1)

# torchvision alexnet.features: conv indices 0,3,6,8,10; relu after each;
# maxpool at 2, 5, 12. lpips slices after each relu: [0:2),[2:5),[5:8),
# [8:10),[10:12).
_ALEX_LAYERS = [
    ("conv", 3, 64, 11, 4, 2), ("relu",), ("pool",),
    ("conv", 64, 192, 5, 1, 2), ("relu",), ("pool",),
    ("conv", 192, 384, 3, 1, 1), ("relu",),
    ("conv", 384, 256, 3, 1, 1), ("relu",),
    ("conv", 256, 256, 3, 1, 1), ("relu",),
]
_SLICE_BOUNDS = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]
_LIN_CHANNELS = [64, 192, 384, 256, 256]


def _build_torch_alex(seed=0):
    torch.manual_seed(seed)
    mods = []
    for spec in _ALEX_LAYERS:
        if spec[0] == "conv":
            _, ic, oc, k, s, p = spec
            mods.append(torch.nn.Conv2d(ic, oc, k, stride=s, padding=p))
        elif spec[0] == "relu":
            mods.append(torch.nn.ReLU())
        else:
            mods.append(torch.nn.MaxPool2d(3, 2))
    return torch.nn.Sequential(*mods)


def _torch_lpips(features, lins, x0, x1):
    """lpips.LPIPS(net='alex', spatial=True).forward + per-sample mean."""
    def feats(x):
        x = (x - _SHIFT) / _SCALE
        outs = []
        for a, b in _SLICE_BOUNDS:
            for i in range(a, b):
                x = features[i](x)
            outs.append(x)
        return outs

    f0, f1 = feats(x0), feats(x1)
    H, W = x0.shape[2:]
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (torch.sqrt((a ** 2).sum(dim=1, keepdim=True)) + 1e-10)
        nb = b / (torch.sqrt((b ** 2).sum(dim=1, keepdim=True)) + 1e-10)
        diff = (na - nb) ** 2
        val = F.conv2d(diff, lins[i])
        val = F.interpolate(val, size=(H, W), mode="bilinear", align_corners=False)
        total = total + val
    return total.mean(dim=(1, 2, 3))


def test_lpips_matches_package_math():
    features = _build_torch_alex()
    gen = torch.Generator().manual_seed(1)
    lins = [torch.rand(1, c, 1, 1, generator=gen) * 0.1 for c in _LIN_CHANNELS]

    # state dict in the lpips package's on-disk layout
    sd = {}
    conv_idx = [0, 3, 6, 8, 10]
    for j, i in enumerate(conv_idx):
        sd[f"net.features.{i}.weight"] = features[i].weight.detach().numpy()
        sd[f"net.features.{i}.bias"] = features[i].bias.detach().numpy()
    for j, w in enumerate(lins):
        sd[f"lin{j}.model.1.weight"] = w.numpy()

    variables = convert_lpips(sd)

    rs = np.random.RandomState(2)
    x0 = (rs.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    x1 = (rs.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)

    with torch.no_grad():
        ref = _torch_lpips(features, lins,
                           torch.from_numpy(x0).permute(0, 3, 1, 2),
                           torch.from_numpy(x1).permute(0, 3, 1, 2))

    ours = LPIPS(spatial=True).apply(variables, jnp.asarray(x0), jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-5)
