"""In-graph stage-1 augmentation (train/device_augment.py) vs the host
numpy/cv2 chain (data/augmentation.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.data import augmentation as host_aug
from extdm_tpu.train import device_augment as dev_aug


def test_canonicalize_images_layouts():
    rs = np.random.RandomState(0)
    gray = rs.randint(0, 256, (2, 8, 8), np.uint8)
    out = np.asarray(dev_aug.canonicalize_images(jnp.asarray(gray)))
    want = np.repeat((gray.astype(np.float32) / 255.0)[..., None], 3, -1)
    np.testing.assert_allclose(out, want)
    f = rs.rand(2, 8, 8, 3).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(dev_aug.canonicalize_images(jnp.asarray(f))), f)


def test_hsv_roundtrip_and_hue_matches_cv2():
    """Exact-HSV hue rotation == the host cv2 path (adjust_hue)."""
    rs = np.random.RandomState(1)
    img = rs.rand(5, 6, 3).astype(np.float32)
    # roundtrip
    h, s, v = dev_aug._rgb_to_hsv(jnp.asarray(img))
    back = np.asarray(dev_aug._hsv_to_rgb(h, s, v))
    np.testing.assert_allclose(back, img, atol=1e-5)
    # hue shift parity vs cv2
    for hue in (-0.23, 0.0, 0.11, 0.5):
        want = host_aug.adjust_hue(img, hue)
        got = np.asarray(dev_aug._hsv_to_rgb((h + hue) % 1.0, s, v))
        np.testing.assert_allclose(np.clip(got, 0, 1), want, atol=2e-4)


def test_jitter_math_matches_host_adjusts():
    """With the SAME factors, each device op == the host adjust_*."""
    rs = np.random.RandomState(2)
    img = rs.rand(3, 8, 8, 3).astype(np.float32)
    x = jnp.asarray(img)
    f = 1.08
    np.testing.assert_allclose(
        np.asarray(jnp.clip(x * f, 0, 1)),
        np.stack([host_aug.adjust_brightness(i, f) for i in img]), atol=1e-6)
    gray = dev_aug._luma(x)[..., None]
    np.testing.assert_allclose(
        np.asarray(jnp.clip(gray * (1 - f) + x * f, 0, 1)),
        np.stack([host_aug.adjust_saturation(i, f) for i in img]), atol=1e-6)
    mean = dev_aug._luma(x).mean(axis=(-2, -1), keepdims=True)[..., None]
    np.testing.assert_allclose(
        np.asarray(jnp.clip(mean * (1 - f) + x * f, 0, 1)),
        np.stack([host_aug.adjust_contrast(i, f) for i in img]), atol=1e-6)


def test_augment_pairs_flip_semantics():
    """Flips: outputs are the pair, the swapped pair, or the H-flipped
    pair — exactly the host RandomFlip outcomes — and the same flip is
    applied to source AND driving."""
    rs = np.random.RandomState(3)
    src = rs.rand(64, 6, 6, 3).astype(np.float32)
    drv = rs.rand(64, 6, 6, 3).astype(np.float32)
    s2, d2 = dev_aug.augment_pairs(
        jnp.asarray(src), jnp.asarray(drv), jax.random.PRNGKey(0),
        flip_param={"time_flip": True, "horizontal_flip": True})
    s2, d2 = np.asarray(s2), np.asarray(d2)
    seen = set()
    for i in range(64):
        if np.allclose(s2[i], src[i]) and np.allclose(d2[i], drv[i]):
            seen.add("id")
        elif np.allclose(s2[i], drv[i]) and np.allclose(d2[i], src[i]):
            seen.add("time")
        elif np.allclose(s2[i], src[i, :, ::-1]) and np.allclose(
                d2[i], drv[i, :, ::-1]):
            seen.add("hflip")
        else:  # pragma: no cover
            raise AssertionError(f"pair {i}: unknown flip outcome")
    assert seen == {"id", "time", "hflip"}  # all three occur across 64


def test_ae_train_step_on_raw_uint8_pairs():
    """The jitted AE train step consumes raw uint8 pairs with in-graph
    augmentation and produces finite losses."""
    from extdm_tpu.models.lfae import ReconstructionModel
    from extdm_tpu.train.ae_trainer import AETrainer, make_optimizer

    model = ReconstructionModel(
        train=True,
        region_predictor_cfg=dict(temperature=0.1, block_expansion=8,
                                  max_features=16, scale_factor=0.5,
                                  num_blocks=2, pca_based=True, pad=0,
                                  estimate_affine=True),
        bg_predictor_cfg=dict(block_expansion=8, max_features=16,
                              num_blocks=2, bg_type="affine"),
        generator_cfg=dict(block_expansion=8, max_features=32,
                           num_down_blocks=2, num_bottleneck_blocks=1,
                           skips=True, revert_axis_swap=True,
                           pixelwise_flow_predictor_params=dict(
                               block_expansion=8, max_features=16,
                               num_blocks=2, scale_factor=0.5,
                               use_deformed_source=True,
                               use_covar_heatmap=True,
                               estimate_occlusion_map=True)),
        num_regions=3, num_channels=3, scales=(1.0, 0.5),
        loss_weights=dict(perceptual=[1, 1, 1, 1, 1],
                          equivariance_shift=10, equivariance_affine=10,
                          reconstruction=10),
        transform_params=dict(sigma_affine=0.05, sigma_tps=0.005,
                              points_tps=5),
    )
    rs = np.random.RandomState(0)
    init_batch = {"source": jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32),
                  "driving": jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)}
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "tps": jax.random.PRNGKey(1)},
        init_batch)
    trainer = AETrainer(
        model, make_optimizer(1e-4, [100], 0.5),
        device_augment={"flip_param": {"horizontal_flip": True},
                        "jitter_param": {"brightness": 0.1, "hue": 0.1,
                                         "saturation": 0.1, "contrast": 0.1}})
    state = trainer.init_state(variables)
    raw = {"source": jnp.asarray(rs.randint(0, 256, (2, 32, 32), np.uint8)),
           "driving": jnp.asarray(rs.randint(0, 256, (2, 32, 32), np.uint8))}
    new_state, aux = trainer.jitted_train_step(donate=False)(
        state, jax.random.PRNGKey(2), raw)
    assert np.isfinite(float(aux["loss_total"]))
    assert int(new_state.step) == 1


class TestDeviceGeometry:
    """apply_geometry (rotation -> resize -> crop as one coordinate map)
    vs the host cv2 ops at FIXED parameters."""

    def test_pure_crop_is_exact(self):
        rs = np.random.RandomState(4)
        img = rs.rand(2, 16, 16, 3).astype(np.float32)
        angle = jnp.zeros((2,))
        ones = jnp.ones((2,))
        offy = jnp.asarray([3.0, 0.0])
        offx = jnp.asarray([5.0, 7.0])
        out = np.asarray(dev_aug.apply_geometry(
            jnp.asarray(img), 8, angle, ones, ones, offy, offx))
        for i, (y, x) in enumerate([(3, 5), (0, 7)]):
            np.testing.assert_allclose(out[i], img[i, y:y + 8, x:x + 8],
                                       atol=1e-6)

    def test_resize_matches_cv2_linear_interior(self):
        import cv2
        rs = np.random.RandomState(5)
        img = rs.rand(1, 16, 16, 3).astype(np.float32)
        s = 1.25  # resized 20x20, crop 16x16 at offset (2, 1)
        want_full = cv2.resize(img[0], (20, 20),
                               interpolation=cv2.INTER_LINEAR)
        want = want_full[2:18, 1:17]
        got = np.asarray(dev_aug.apply_geometry(
            jnp.asarray(img), 16, jnp.zeros((1,)),
            jnp.asarray([20 / 16]), jnp.asarray([20 / 16]),
            jnp.asarray([2.0]), jnp.asarray([1.0])))[0]
        # interior only: the half-pixel border differs (zero-fill vs
        # cv2's edge clamping)
        np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1],
                                   atol=1e-5)

    def test_rotation_matches_cv2_warpaffine_interior(self):
        import cv2
        rs = np.random.RandomState(6)
        img = rs.rand(1, 24, 24, 3).astype(np.float32)
        deg = 13.0
        mat = cv2.getRotationMatrix2D((12.0, 12.0), deg, 1.0)
        want = cv2.warpAffine(img[0], mat, (24, 24))
        got = np.asarray(dev_aug.apply_geometry(
            jnp.asarray(img), 24, jnp.asarray([np.deg2rad(deg)]),
            jnp.ones((1,)), jnp.ones((1,)),
            jnp.zeros((1,)), jnp.zeros((1,))))[0]
        # compare away from the zero-filled corners
        np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4],
                                   atol=1e-4)

    def test_downscale_pads_centered_like_host_randomcrop(self):
        """scale < 1: resized frame smaller than the crop -> centered
        zero pad, matching host RandomCrop's np.pad branch."""
        import cv2
        rs = np.random.RandomState(7)
        img = rs.rand(1, 16, 16, 3).astype(np.float32)
        s = 0.5  # resized 8x8 inside a 16x16 output, pad 4 on each side
        angle, sy, sx, offy, offx = dev_aug.sample_geometry(
            jax.random.PRNGKey(0), 1, (16, 16), 16,
            resize_param={"ratio": (s, s)}, crop_param={"size": 16})
        assert float(offy[0]) == -4.0 and float(offx[0]) == -4.0
        got = np.asarray(dev_aug.apply_geometry(
            jnp.asarray(img), 16, angle, sy, sx, offy, offx))[0]
        want_small = cv2.resize(img[0], (8, 8),
                                interpolation=cv2.INTER_LINEAR)
        # interior of the pasted region matches the cv2 downscale
        np.testing.assert_allclose(got[5:11, 5:11], want_small[1:-1, 1:-1],
                                   atol=0.15)
        # pad region is zero
        assert np.all(got[:3] == 0) and np.all(got[:, :3] == 0)
        assert np.all(got[-3:] == 0) and np.all(got[:, -3:] == 0)

    def test_augment_pairs_geometry_end_to_end(self):
        """Full chain under jit: raw uint8 pair -> flip + rotation +
        resize + crop + jitter, static (B, out, out, 3) output, geometry
        shared across the pair."""
        rs = np.random.RandomState(8)
        raw_s = jnp.asarray(rs.randint(0, 256, (4, 32, 32), np.uint8))
        raw_d = jnp.asarray(rs.randint(0, 256, (4, 32, 32), np.uint8))
        fn = jax.jit(lambda s, d, k: dev_aug.augment_pairs(
            s, d, k,
            flip_param={"horizontal_flip": True},
            rotation_param={"degrees": 10},
            resize_param={"ratio": (0.9, 1.1)},
            crop_param={"size": 24},
            jitter_param={"brightness": 0.1, "hue": 0.1}))
        s2, d2 = fn(raw_s, raw_d, jax.random.PRNGKey(1))
        assert s2.shape == (4, 24, 24, 3) and d2.shape == (4, 24, 24, 3)
        assert np.isfinite(np.asarray(s2)).all()
        assert np.isfinite(np.asarray(d2)).all()
        # geometry is shared across the pair: identical zero-fill masks
        # (jitter maps exact zeros to zeros, so the fill survives it)
        np.testing.assert_array_equal(np.asarray(s2) == 0, np.asarray(d2) == 0)
