"""Metric tests: PSNR/SSIM parity against the reference formulas (computed
here with scipy/numpy vs reference cv2 math), Fréchet distance sanity, I3D
and LPIPS shapes/determinism, trajectory selection."""
import numpy as np
import pytest

from extdm_tpu.metrics import (
    I3DExtractor,
    LPIPSMetric,
    best_trajectory_by_feature_distance,
    calculate_fvd2,
    calculate_psnr1,
    calculate_psnr2,
    calculate_psnr3,
    calculate_ssim1,
    calculate_ssim2,
    frechet_distance,
    preprocess_videos,
)


def _vids(seed, n=2, t=3, c=3, h=32, w=32):
    return np.random.RandomState(seed).rand(n, t, c, h, w).astype(np.float32)


class TestPSNR:
    def test_identical_is_capped(self):
        v = _vids(0)
        r, _ = calculate_psnr1(v, v)
        assert r["psnr"] == 100.0

    def test_matches_reference_formula(self):
        import math

        v1, v2 = _vids(1), _vids(2)
        mat = calculate_psnr3(v1, v2)
        # reference img_psnr on one frame
        mse = np.mean((v1[0, 0].astype(np.float64) - v2[0, 0].astype(np.float64)) ** 2)
        expected = 20 * math.log10(1 / math.sqrt(mse))
        np.testing.assert_allclose(mat[0, 0], expected, rtol=1e-9)

    def test_best_of_n(self):
        v1 = np.tile(_vids(3, n=1), (4, 1, 1, 1, 1))
        v2 = v1.copy()
        v2[1:] += 0.3  # trajectory 0 is exact
        assert calculate_psnr2(v2, v1, num_sample=4) == 100.0


class TestSSIM:
    def test_identical(self):
        v = _vids(4)
        r, _ = calculate_ssim1(v, v)
        assert r["ssim"] > 0.9999

    def test_matches_cv2_reference(self):
        import cv2

        img1 = np.random.RandomState(5).rand(32, 32)
        img2 = np.random.RandomState(6).rand(32, 32)
        from extdm_tpu.metrics.ssim import ssim_image

        # reference implementation (calculate_ssim.py:6-23)
        C1, C2 = 0.01**2, 0.03**2
        kernel = cv2.getGaussianKernel(11, 1.5)
        window = np.outer(kernel, kernel.T)
        mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
        mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
        s1 = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1**2
        s2 = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2**2
        s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1 * mu2
        ref = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
               / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))).mean()
        np.testing.assert_allclose(ssim_image(img1, img2), ref, rtol=1e-6)

    def test_best_of_n(self):
        v1 = np.tile(_vids(7, n=1), (2, 1, 1, 1, 1))
        v2 = v1.copy()
        v2[1] = np.clip(v2[1] + 0.4, 0, 1)
        assert calculate_ssim2(v2, v1, num_sample=2) > 0.999

    def test_channels_last_raises_loudly(self):
        # Regression: a channels-last (B, T, H, W, C) batch used to reach the
        # native kernel as w == C == 3 and abort the whole process
        # (std::length_error in a C++ vector resize). It must raise instead.
        v = np.random.RandomState(8).rand(2, 3, 32, 32, 3).astype(np.float32)
        with np.testing.assert_raises(ValueError):
            calculate_ssim1(v, v)


class TestFrechet:
    def test_zero_for_same_distribution(self):
        f = np.random.RandomState(8).randn(64, 16)
        assert frechet_distance(f, f.copy()) < 1e-6

    def test_increases_with_mean_shift(self):
        f1 = np.random.RandomState(9).randn(128, 8)
        d1 = frechet_distance(f1 + 1.0, f1)
        d2 = frechet_distance(f1 + 2.0, f1)
        assert 0 < d1 < d2
        assert abs(d1 - 8.0) < 1.5  # mean term = sum((1)^2 * 8 dims)

    def test_calculate_fvd2(self):
        f1 = np.random.RandomState(10).randn(32, 8)
        f2 = np.random.RandomState(11).randn(32, 8) + 0.5
        assert calculate_fvd2(f1, f2) > 0

    def test_nonfinite_features_return_nan_not_hang(self):
        """NaN features must short-circuit: scipy sqrtm on NaN matrices
        can spin forever inside LAPACK (wedged a training run's periodic
        validation)."""
        import warnings

        f1 = np.random.RandomState(12).randn(16, 8)
        f2 = f1.copy()
        f2[0, 0] = np.nan
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert np.isnan(frechet_distance(f1, f2))
            assert any("non-finite" in str(x.message) for x in w)


class TestI3D:
    def test_preprocess(self):
        import jax.numpy as jnp

        v = jnp.asarray(np.random.RandomState(12).rand(1, 4, 36, 64, 3), jnp.float32)
        out = preprocess_videos(v)
        assert out.shape == (1, 4, 224, 224, 3)
        assert float(out.min()) >= -1 and float(out.max()) <= 1

    @pytest.mark.slow
    def test_short_clip_features_finite(self):
        """8-frame clips reach the final avg_pool with T'=1; the clamped
        temporal kernel must yield finite features (a hard kernel of 2
        produced a ZERO-size pool whose mean was silently NaN)."""
        ex = I3DExtractor(seed=0)
        v = np.random.RandomState(21).rand(2, 8, 32, 32, 3).astype(np.float32)
        f = ex.get_feats(v)
        assert f.shape == (2, 400)
        assert np.isfinite(f).all()

    @pytest.mark.slow
    def test_feature_shapes_deterministic(self):
        ex1 = I3DExtractor(seed=0)
        ex2 = I3DExtractor(seed=0)
        v = np.random.RandomState(13).rand(2, 16, 64, 64, 3).astype(np.float32)
        f1 = ex1.get_feats(v)
        f2 = ex2.get_feats(v)
        assert f1.shape == (2, 400)
        np.testing.assert_allclose(f1, f2, atol=1e-5)
        assert not ex1.pretrained


class TestTrajectorySelection:
    def test_picks_closest(self):
        real = np.random.RandomState(14).randn(3, 8)
        traj = np.repeat(real, 4, axis=0) + np.random.RandomState(15).randn(12, 8)
        traj[1] = real[0]  # exact match at traj 1 of group 0
        traj[4 + 2] = real[1]
        idx = best_trajectory_by_feature_distance(real, traj, num_sample=4)
        assert idx[0] == 1 and idx[1] == 2


class TestLPIPS:
    def test_zero_for_identical(self):
        m = LPIPSMetric(seed=0)
        v = np.random.RandomState(16).rand(1, 2, 32, 32, 3).astype(np.float32)
        mat = m.calculate_lpips3(v, v)
        np.testing.assert_allclose(mat, 0.0, atol=1e-6)

    def test_positive_and_best_of_n(self):
        m = LPIPSMetric(seed=0)
        v1 = np.random.RandomState(17).rand(2, 2, 32, 32, 3).astype(np.float32)
        v2 = np.clip(v1 + 0.2, 0, 1)
        r, _ = m.calculate_lpips1(v1, v2)
        assert r["lpips"] > 0
        # best-of-2 where trajectory 0 is exact
        stacked = np.concatenate([v1, v2])[np.array([0, 2, 1, 3])]
        best = m.calculate_lpips2(stacked, np.repeat(v1, 2, axis=0), num_sample=2)
        assert best < 1e-6
