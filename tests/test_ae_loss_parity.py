"""Golden parity for the stage-1 perceptual-loss stack vs the reference.

Builds a torch replica of torchvision `vgg19().features` (the exact
Sequential layout the reference `Vgg19` slices at relu1_1..relu5_1,
/root/reference/model/LFAE/model.py:19-60) with random weights, converts
its state dict with `convert_vgg19`, and checks

1. feature-level parity of `Vgg19Features` against the torch slices, and
2. the full multi-scale perceptual TOTAL: reference `ImagePyramide`
   (AntiAliasInterpolation2d, model.py:63-79) + per-layer weighted L1
   (model.py:179-193) vs our `antialias_downsample` + the same loop in
   `ReconstructionModel` semantics.

This guards the VGG weight-conversion path end-to-end so pretrained
torchvision weights drop in without surprises.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
torch = pytest.importorskip("torch")

import reference_stubs  # noqa: E402

reference_stubs.install()
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from extdm_tpu.convert.torch2jax import convert_vgg19  # noqa: E402
from extdm_tpu.models.lfae.vgg import Vgg19Features  # noqa: E402
from extdm_tpu.ops.antialias import antialias_downsample  # noqa: E402

# torchvision vgg19 features layout: conv indices 0,2,5,7,10,12,14,16,
# 19,21,23,25,28 with ReLU after each conv and MaxPool at 4,9,18,27.
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _build_torch_vgg19_features(seed=0):
    tnn = torch.nn
    torch.manual_seed(seed)
    layers = []
    in_c = 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
            layers.append(tnn.ReLU())
            in_c = v
    return tnn.Sequential(*layers)


_MEAN = torch.tensor([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)
_STD = torch.tensor([0.229, 0.224, 0.225]).reshape(1, 3, 1, 1)


def _torch_vgg_slices(features, x_nchw):
    """Reference Vgg19.forward (model.py:53-62): normalized input through
    the five relu1_1..relu5_1 slices [0:2), [2:7), [7:12), [12:21), [21:30)."""
    x = (x_nchw - _MEAN) / _STD
    outs = []
    bounds = [(0, 2), (2, 7), (7, 12), (12, 21), (21, 30)]
    for a, b in bounds:
        for i in range(a, b):
            x = features[i](x)
        outs.append(x)
    return outs


@pytest.fixture(scope="module")
def vgg_pair():
    features = _build_torch_vgg19_features()
    sd = {k: v.detach().numpy() for k, v in features.state_dict().items()}
    variables = convert_vgg19(sd)
    return features, variables


class TestVggParity:
    def test_features_match(self, vgg_pair):
        features, variables = vgg_pair
        rs = np.random.RandomState(0)
        x = rs.rand(2, 32, 32, 3).astype(np.float32)
        ours = Vgg19Features().apply(variables, jnp.asarray(x))
        with torch.no_grad():
            ref = _torch_vgg_slices(features,
                                    torch.from_numpy(x).permute(0, 3, 1, 2))
        assert len(ours) == len(ref) == 5
        for i, (a, b) in enumerate(zip(ours, ref)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
                rtol=2e-4, atol=2e-4, err_msg=f"slice {i}")

    def test_multiscale_perceptual_total_matches(self, vgg_pair):
        from model.LFAE.model import ImagePyramide  # reference

        features, variables = vgg_pair
        scales = [1, 0.5, 0.25]
        weights = [10, 10, 10, 10, 10]
        rs = np.random.RandomState(1)
        pred = rs.rand(2, 64, 64, 3).astype(np.float32)
        real = rs.rand(2, 64, 64, 3).astype(np.float32)

        # --- reference computation (model.py:176-193) -----------------
        pyramid = ImagePyramide(scales, num_channels=3)
        t_pred = torch.from_numpy(pred).permute(0, 3, 1, 2)
        t_real = torch.from_numpy(real).permute(0, 3, 1, 2)
        with torch.no_grad():
            pg = pyramid(t_pred)
            pr = pyramid(t_real)
            ref_total = 0.0
            for scale in scales:
                x_vgg = _torch_vgg_slices(features, pg[f"prediction_{scale}"])
                y_vgg = _torch_vgg_slices(features, pr[f"prediction_{scale}"])
                for i, w in enumerate(weights):
                    ref_total += w * torch.abs(x_vgg[i] - y_vgg[i]).mean()
        ref_total = float(ref_total)

        # --- ours (recon_model.py perceptual loop semantics) ----------
        vgg = Vgg19Features()
        total = 0.0
        for scale in scales:
            gen_s = antialias_downsample(jnp.asarray(pred), scale)
            real_s = antialias_downsample(jnp.asarray(real), scale)
            xf = vgg.apply(variables, gen_s)
            yf = vgg.apply(variables, real_s)
            for w, a, b in zip(weights, xf, yf):
                total += w * jnp.abs(a - b).mean()
        np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
