"""Golden parity for the FVD plumbing vs the live reference metrics/fvd.py:
`preprocess_single` (shorter-side 224 bilinear resize, center crop,
[0,1]->[-1,1]; fvd.py:161-187) and `frechet_distance` (scipy sqrtm,
fvd.py:276-291)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
torch = pytest.importorskip("torch")

import reference_stubs  # noqa: E402

reference_stubs.install()
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp  # noqa: E402

from metrics.fvd import frechet_distance as ref_frechet  # noqa: E402
from metrics.fvd import preprocess_single  # noqa: E402

from extdm_tpu.metrics.fvd import frechet_distance, preprocess_videos  # noqa: E402


@pytest.mark.parametrize("hw", [(36, 64), (64, 36), (64, 64), (128, 96)])
def test_preprocess_matches_reference(hw):
    H, W = hw
    rs = np.random.RandomState(0)
    vid = rs.rand(2, 3, H, W, 3).astype(np.float32)
    ours = np.asarray(preprocess_videos(jnp.asarray(vid)))
    for b in range(2):
        with torch.no_grad():
            # reference takes one CTHW video
            ref = preprocess_single(
                torch.from_numpy(vid[b]).permute(3, 0, 1, 2))
        np.testing.assert_allclose(
            ours[b], ref.numpy().transpose(1, 2, 3, 0), rtol=1e-4, atol=1e-5)


def test_frechet_distance_matches_reference():
    rs = np.random.RandomState(1)
    real = rs.randn(48, 16).astype(np.float64)
    fake = (rs.randn(48, 16) * 1.3 + 0.2).astype(np.float64)
    np.testing.assert_allclose(
        frechet_distance(fake, real), ref_frechet(fake, real), rtol=1e-6)
    # identical distributions -> ~0
    assert abs(frechet_distance(real, real)) < 1e-6
