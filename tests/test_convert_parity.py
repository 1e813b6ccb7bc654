"""Golden parity: reference torch LFAE (random weights, eval mode) vs our
flax modules with converted weights — same inputs, same outputs.

This is the strongest correctness evidence available (the snapshot ships no
pretrained checkpoints — .MISSING_LARGE_BLOBS), and it validates the
checkpoint converter end-to-end, so real reference checkpoints will load
correctly too.
"""
import sys
import types

import numpy as np
import pytest

# --- make /root/reference importable (it imports skimage, absent here) ----------
if "skimage" not in sys.modules:
    skimage = types.ModuleType("skimage")
    draw = types.ModuleType("skimage.draw")
    draw.disk = lambda *a, **k: (np.zeros(0, int), np.zeros(0, int))
    skimage.draw = draw
    sys.modules["skimage"] = skimage
    sys.modules["skimage.draw"] = draw
sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

from model.LFAE.bg_motion_predictor import BGMotionPredictor as TorchBG  # noqa: E402
from model.LFAE.generator import Generator as TorchGenerator  # noqa: E402
from model.LFAE.region_predictor import RegionPredictor as TorchRegion  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from extdm_tpu.convert.torch2jax import (  # noqa: E402
    convert_bg_predictor,
    convert_generator,
    convert_region_predictor,
)
from extdm_tpu.models.lfae import BGMotionPredictor, Generator, RegionPredictor  # noqa: E402

NUM_REGIONS = 4
PIX_FLOW = dict(
    block_expansion=16, max_features=64, num_blocks=2, scale_factor=0.5,
    use_deformed_source=True, use_covar_heatmap=True, estimate_occlusion_map=True,
)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _img(seed, b=2, h=64, w=64):
    rng = np.random.RandomState(seed)
    return rng.rand(b, 3, h, w).astype(np.float32)


@pytest.fixture(scope="module")
def region_pair():
    torch.manual_seed(0)
    t = TorchRegion(block_expansion=16, num_regions=NUM_REGIONS, num_channels=3,
                    max_features=64, num_blocks=2, temperature=0.1,
                    estimate_affine=True, scale_factor=0.5, pca_based=True, pad=0).eval()
    j = RegionPredictor(num_regions=NUM_REGIONS, block_expansion=16, max_features=64,
                        num_blocks=2, temperature=0.1, scale_factor=0.5,
                        pca_based=True, pad=0, train=False)
    variables = convert_region_predictor(_sd(t), num_blocks=2)
    return t, j, variables


class TestRegionParity:
    def test_outputs_match(self, region_pair):
        t, j, variables = region_pair
        x = _img(1)
        with torch.no_grad():
            ref = t(torch.from_numpy(x))
        out = j.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out["shift"]), ref["shift"].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["covar"]), ref["covar"].numpy(),
                                   rtol=1e-3, atol=1e-5)
        # affine may differ by per-eigenvector sign; compare covar reconstruction
        aff = np.asarray(out["affine"])
        np.testing.assert_allclose(aff @ aff.transpose(0, 1, 3, 2), ref["covar"].numpy(),
                                   rtol=1e-3, atol=1e-5)
        hm = np.asarray(out["heatmap"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(hm, ref["heatmap"].numpy(), rtol=1e-3, atol=1e-6)


class TestBGParity:
    def test_affine_match(self):
        torch.manual_seed(1)
        t = TorchBG(block_expansion=16, num_channels=3, max_features=64,
                    num_blocks=2, bg_type="affine").eval()
        # give the zero-init fc real weights so the test is nontrivial
        with torch.no_grad():
            t.fc.weight.normal_(0, 0.05)
        j = BGMotionPredictor(block_expansion=16, max_features=64, num_blocks=2,
                              bg_type="affine", train=False)
        variables = convert_bg_predictor(_sd(t), num_blocks=2)
        s, d = _img(2), _img(3)
        with torch.no_grad():
            ref = t(torch.from_numpy(s), torch.from_numpy(d))
        out = j.apply(variables, jnp.asarray(s.transpose(0, 2, 3, 1)),
                      jnp.asarray(d.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def generator_pair():
    torch.manual_seed(2)
    t = TorchGenerator(num_channels=3, num_regions=NUM_REGIONS, block_expansion=16,
                       max_features=64, num_down_blocks=2, num_bottleneck_blocks=2,
                       skips=True, revert_axis_swap=True,
                       pixelwise_flow_predictor_params=PIX_FLOW).eval()
    j = Generator(num_regions=NUM_REGIONS, num_channels=3, block_expansion=16,
                  max_features=64, num_down_blocks=2, num_bottleneck_blocks=2,
                  skips=True, revert_axis_swap=True,
                  pixelwise_flow_predictor_params=PIX_FLOW, train=False)
    variables = convert_generator(_sd(t), num_down_blocks=2, num_bottleneck_blocks=2,
                                  flow_num_blocks=2)
    return t, j, variables


def _region_params(seed, b=2):
    rng = np.random.RandomState(seed)
    shift = rng.uniform(-0.3, 0.3, (b, NUM_REGIONS, 2)).astype(np.float32)
    m = rng.randn(b, NUM_REGIONS, 2, 2).astype(np.float32) * 0.1
    covar = m @ m.transpose(0, 1, 3, 2) + 0.02 * np.eye(2, dtype=np.float32)
    affine = np.linalg.cholesky(covar).astype(np.float32)
    return {"shift": shift, "covar": covar, "affine": affine}


class TestGeneratorParity:
    def test_full_forward_match(self, generator_pair):
        t, j, variables = generator_pair
        src = _img(4)
        sp = _region_params(5)
        dp = _region_params(6)
        bg = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        bg[:, :2, 2] = 0.05

        t_sp = {k: torch.from_numpy(v) for k, v in sp.items()}
        t_dp = {k: torch.from_numpy(v) for k, v in dp.items()}
        with torch.no_grad():
            ref = t(torch.from_numpy(src), t_dp, t_sp, torch.from_numpy(bg))
        out = j.apply(
            variables,
            jnp.asarray(src.transpose(0, 2, 3, 1)),
            {k: jnp.asarray(v) for k, v in dp.items()},
            {k: jnp.asarray(v) for k, v in sp.items()},
            jnp.asarray(bg),
        )
        np.testing.assert_allclose(
            np.asarray(out["optical_flow"]), ref["optical_flow"].numpy(),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["occlusion_map"])[..., 0], ref["occlusion_map"].numpy()[:, 0],
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["prediction"]).transpose(0, 3, 1, 2), ref["prediction"].numpy(),
            rtol=1e-3, atol=2e-4,
        )

    def test_flow_decode_match(self, generator_pair):
        t, j, variables = generator_pair
        src = _img(7, b=1)
        rng = np.random.RandomState(8)
        from extdm_tpu.ops.coords import make_coordinate_grid

        flow = (np.asarray(make_coordinate_grid(32, 32))[None]
                + rng.uniform(-0.05, 0.05, (1, 32, 32, 2))).astype(np.float32)
        occ = rng.rand(1, 1, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref = t.forward_with_flow(torch.from_numpy(src), torch.from_numpy(flow),
                                      torch.from_numpy(occ))
        out = j.apply(variables, jnp.asarray(src.transpose(0, 2, 3, 1)), mode="flow",
                      optical_flow=jnp.asarray(flow),
                      occlusion_map=jnp.asarray(occ.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out["prediction"]).transpose(0, 3, 1, 2), ref["prediction"].numpy(),
            rtol=1e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["deformed"]).transpose(0, 3, 1, 2), ref["deformed"].numpy(),
            rtol=1e-3, atol=1e-4,
        )
