"""Golden parity: flax InceptionI3d + convert_i3d vs the LIVE reference
`metrics/pytorch_i3d.InceptionI3d` (the FVD backbone fallback,
/root/reference/metrics/pytorch_i3d.py:135-321).

Random-init torch model (randomized BN running stats so the bn conversion
is actually exercised), state dict through `convert_i3d`, logits compared
on the FVD input shape family (B, 16, 224, 224, 3). The reference's
pure-torch I3D uses BatchNorm eps=1e-5 (pytorch_i3d.py:69) vs the
TF/TorchScript backbone's 1e-3, hence bn_eps=1e-5 here.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
torch = pytest.importorskip("torch")

import reference_stubs  # noqa: E402

reference_stubs.install()
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp  # noqa: E402

from metrics.pytorch_i3d import InceptionI3d as RefI3D  # noqa: E402

from extdm_tpu.convert.torch2jax import convert_i3d  # noqa: E402
from extdm_tpu.metrics.i3d import InceptionI3d  # noqa: E402


def test_logits_match_reference():
    torch.manual_seed(0)
    ref = RefI3D(num_classes=400, in_channels=3)
    ref.eval()
    # randomize BN running stats so their conversion is load-bearing
    gen = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_i3d(sd)

    rs = np.random.RandomState(2)
    vid = (rs.rand(1, 16, 224, 224, 3) * 2 - 1).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(vid).permute(0, 4, 1, 2, 3))

    ours = InceptionI3d(bn_eps=1e-5).apply(variables, jnp.asarray(vid))
    np.testing.assert_allclose(np.asarray(ours), ref_logits.numpy(),
                               rtol=1e-3, atol=1e-3)
