"""Config loading / arch preset / trainer-state checkpoint tests."""
import glob

import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.config import ARCH_PRESETS, ae_model_kwargs, dm_config_from_yaml, load_config


class TestConfigs:
    @pytest.mark.parametrize("path", sorted(glob.glob("configs/DM/*.yaml")))
    def test_dm_configs_build(self, path):
        cfg = load_config(path)
        fd_cfg = dm_config_from_yaml(cfg)
        assert fd_cfg.cond_frames > 0 and fd_cfg.pred_frames > 0
        assert fd_cfg.bottleneck_dim == 256  # KTH-family generator width

    @pytest.mark.parametrize("path", sorted(glob.glob("configs/AE/*.yaml")))
    def test_ae_configs_build(self, path):
        cfg = load_config(path)
        kwargs = ae_model_kwargs(cfg)
        assert kwargs["num_regions"] >= 3
        assert "loss_weights" in kwargs and "reconstruction" in kwargs["loss_weights"]

    @pytest.mark.parametrize("arch", sorted(ARCH_PRESETS))
    def test_arch_presets(self, arch):
        cfg = load_config("configs/DM/kth.yaml")
        fd_cfg = dm_config_from_yaml(cfg, arch=arch)
        assert fd_cfg.conditioning in ("adaptor", "trajwarp")

    def test_overrides_win(self):
        cfg = load_config("configs/DM/kth.yaml")
        fd_cfg = dm_config_from_yaml(cfg, sampling_timesteps=3, dim=16)
        assert fd_cfg.sampling_timesteps == 3 and fd_cfg.dim == 16


class TestLRSchedule:
    def test_multi_step_matches_torch_multisteplr(self):
        from extdm_tpu.train import multi_step

        sched = multi_step(1.0, [10, 20], 0.5)
        assert float(sched(0)) == 1.0
        assert float(sched(9)) == 1.0
        assert float(sched(10)) == 0.5
        assert float(sched(20)) == 0.25
        assert float(sched(100)) == 0.25

    def test_warmup_schedules(self):
        from extdm_tpu.train import warmup_cosine, warmup_linear

        for fn in (warmup_cosine(1.0, 10, 100), warmup_linear(1.0, 10, 100)):
            assert float(fn(0)) == 0.0
            assert abs(float(fn(10)) - 1.0) < 1e-6
            assert float(fn(100)) < 0.01


class TestCheckpointHelpers:
    def test_start_step(self):
        from extdm_tpu.train import start_step_from_example

        assert start_step_from_example(100, 32) == 4
        assert start_step_from_example(96, 32) == 3

    def test_save_load_nested(self, tmp_path):
        from extdm_tpu.train import load_checkpoint, restore_like, save_checkpoint

        payload = {"example": 7, "state": {"a": jnp.arange(3.0), "b": {"c": jnp.ones((2, 2))}}}
        p = str(tmp_path / "x.ckpt")
        save_checkpoint(p, payload)
        back = load_checkpoint(p)
        assert back["example"] == 7
        restored = restore_like(payload["state"], back["state"])
        np.testing.assert_allclose(np.asarray(restored["b"]["c"]), np.ones((2, 2)))
