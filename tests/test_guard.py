"""Failure detection: nan_guard skips non-finite update steps in-graph
(the reference has no failure handling — SURVEY §5)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge  # noqa: E402
from extdm_tpu.train.dm_trainer import (  # noqa: E402
    DMTrainer,
    make_optimizer,
    notfinite_count,
)


def _leaf0(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def test_nan_batch_is_skipped_then_recovers():
    fd = ge._tiny_fd()
    lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
    trainer = DMTrainer(fd, make_optimizer(1e-4, [100], 0.5, nan_guard=3))
    state = trainer.init_state(unet_vars)
    step = trainer.jitted_train_step(donate=False)

    good = jnp.asarray(np.random.RandomState(0).rand(2, 4, 32, 32, 3),
                       jnp.float32)
    bad = good.at[0, 0, 0, 0, 0].set(jnp.nan)

    p0 = _leaf0(state.unet_params)
    state1, aux1 = step(state, lfae_vars, jax.random.PRNGKey(1), bad)
    # params unchanged by the poisoned step, counter advanced
    np.testing.assert_array_equal(_leaf0(state1.unet_params), p0)
    assert int(notfinite_count(state1.opt_state)) == 1

    state2, aux2 = step(state1, lfae_vars, jax.random.PRNGKey(2), good)
    assert np.isfinite(float(aux2["loss"]))
    assert int(notfinite_count(state2.opt_state)) == 0  # reset by good step
    assert not np.array_equal(_leaf0(state2.unet_params), p0)  # updated


def test_no_guard_returns_none_counter():
    fd = ge._tiny_fd()
    _, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
    trainer = DMTrainer(fd, make_optimizer(1e-4, [100], 0.5))
    state = trainer.init_state(unet_vars)
    assert notfinite_count(state.opt_state) is None


def test_canonicalize_video_uint8_matches_host_path():
    """In-graph uint8 canonicalization == host /255 + to_rgb_video for
    every stored layout the loader ships raw (dm_trainer.canonicalize_video;
    ref dataset2video layout contract, data/video_dataset.py:17-33)."""
    import numpy as np

    from extdm_tpu.data import to_rgb_video
    from extdm_tpu.train.dm_trainer import canonicalize_video

    rs = np.random.RandomState(0)
    gray = rs.randint(0, 256, (2, 3, 8, 8), np.uint8)        # (B,T,H,W)
    chan1 = rs.randint(0, 256, (2, 3, 8, 8, 1), np.uint8)    # (B,T,H,W,1)
    rgb = rs.randint(0, 256, (2, 3, 8, 8, 3), np.uint8)      # (B,T,H,W,3)
    for raw in (gray, chan1, rgb):
        dev = np.asarray(canonicalize_video(jnp.asarray(raw)))
        host = np.stack([to_rgb_video(c.astype(np.float32) / 255.0)
                         for c in raw])
        np.testing.assert_allclose(dev, host, atol=1e-7)
        assert dev.shape[-1] == 3 and dev.dtype == np.float32
    # float inputs pass through untouched
    f = jnp.asarray(rs.rand(2, 3, 8, 8, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(canonicalize_video(f)),
                                  np.asarray(f))


def test_train_step_accepts_raw_uint8_video():
    """The jitted DM train step consumes the loader's raw uint8 batch
    (stored gray layout) and matches the f32-RGB path's loss exactly —
    guards the in-graph canonicalization wiring (round-4 input-pipeline
    rework: 1/12th the host->device bytes)."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from extdm_tpu.train.dm_trainer import DMTrainer, make_optimizer

    fd = ge._tiny_fd()
    lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
    trainer = DMTrainer(fd, make_optimizer(1e-4, [100], 0.5))
    state = trainer.init_state(unet_vars)
    step = trainer.jitted_train_step(donate=False)

    raw = np.random.RandomState(0).randint(
        0, 256, (2, 4, 32, 32), np.uint8)  # (B, T, H, W) gray
    f32 = np.repeat((raw.astype(np.float32) / 255.0)[..., None], 3, -1)

    _, aux_raw = step(state, lfae_vars, jax.random.PRNGKey(1),
                      jnp.asarray(raw))
    _, aux_f32 = step(state, lfae_vars, jax.random.PRNGKey(1),
                      jnp.asarray(f32))
    np.testing.assert_allclose(float(aux_raw["loss"]),
                               float(aux_f32["loss"]), rtol=1e-6)
