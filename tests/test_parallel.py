"""Mesh/sharding tests on the 8-device virtual CPU mesh, plus the trainers
and the driver graft entry points."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extdm_tpu.parallel import make_mesh, param_shardings, shard_batch, shard_params


class TestMesh:
    def test_make_mesh_shapes(self, devices):
        mesh = make_mesh(devices=devices)
        assert dict(mesh.shape) == {"data": 8, "model": 1}
        mesh = make_mesh(model=2, devices=devices)
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_shard_batch(self, devices):
        mesh = make_mesh(devices=devices)
        x = jnp.zeros((16, 3, 4))
        xs = shard_batch(x, mesh)
        assert xs.sharding.spec == jax.sharding.PartitionSpec("data")

    def test_shard_params_rule(self, devices):
        mesh = make_mesh(model=2, devices=devices)
        params = {
            "layer": {"kernel": jnp.zeros((256, 64)), "bias": jnp.zeros((64,))},
            "tiny": {"kernel": jnp.zeros((4, 4))},
        }
        sharded = shard_params(params, mesh)
        spec = sharded["layer"]["kernel"].sharding.spec
        assert spec == jax.sharding.PartitionSpec(None, "model")
        assert sharded["layer"]["bias"].sharding.spec == jax.sharding.PartitionSpec()
        assert sharded["tiny"]["kernel"].sharding.spec == jax.sharding.PartitionSpec()

    def test_global_batchnorm_is_syncbn(self, devices):
        """BN statistics under pjit are global-batch — the SyncBN property."""
        import flax.linen as nn

        mesh = make_mesh(devices=devices)

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.BatchNorm(use_running_average=False, momentum=0.9)(x)

        m = M()
        # per-device batches have different statistics
        x = np.concatenate([np.full((2, 4), i, np.float32) for i in range(8)])
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

        xs = shard_batch(jnp.asarray(x), mesh)

        @jax.jit
        def fwd(v, x):
            y, mut = m.apply(v, x, mutable=["batch_stats"])
            return mut["batch_stats"]["BatchNorm_0"]["mean"]

        with mesh:
            mean = fwd(variables, xs)
        expected = 0.9 * 0.0 + 0.1 * x.mean()  # momentum update toward global mean
        np.testing.assert_allclose(np.asarray(mean), np.full(4, expected), rtol=1e-5)


class TestGraftEntry:
    def test_entry_compiles(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))

    def test_dryrun_multichip(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardMapTrainStep:
    def test_dp_shard_map_matches_semantics(self, devices):
        """shard_map DP step runs, loss finite, params stay replicated."""
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        from extdm_tpu.train.dm_trainer import DMTrainer, make_optimizer

        mesh = make_mesh(devices=devices)  # (8, 1)
        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        trainer = DMTrainer(fd, make_optimizer(1e-4, [100], 0.5))
        state = trainer.init_state(unet_vars)

        video = jnp.asarray(
            np.random.RandomState(0).rand(16, 4, 32, 32, 3), np.float32)
        video = shard_batch(video, mesh)
        step_fn = trainer.shard_mapped_train_step(mesh, donate=False)
        new_state, aux = step_fn(state, lfae_vars, jax.random.PRNGKey(1), video)
        assert np.isfinite(float(aux["loss"]))
        assert int(new_state.step) == 1
        # params identical across devices (replicated out_spec)
        leaf = jax.tree_util.tree_leaves(new_state.unet_params)[0]
        assert leaf.sharding.is_fully_replicated


class TestShardedSampler:
    def test_matches_per_shard_plain_sampler(self, devices):
        """Sharded sampler == plain sampler run per shard with fold_in(key, i)."""
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        n = 4
        mesh = make_mesh(model=1, devices=devices[:n])
        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        tc = fd.cfg.cond_frames

        B = 2 * n
        cond = jnp.asarray(
            np.random.RandomState(0).rand(B, tc, 32, 32, 3), np.float32)
        key = jax.random.PRNGKey(7)

        sharded = fd.make_sharded_sampler(lfae_vars, unet_vars, mesh)
        out = sharded(key, shard_batch(cond, mesh))
        vid = np.asarray(out["sample_out_vid"])
        assert vid.shape == (B, tc + fd.cfg.pred_frames, 32, 32, 3)
        assert np.isfinite(vid).all()

        plain = fd.make_sampler(lfae_vars, unet_vars)
        per = B // n
        for i in range(n):
            ref = plain(jax.random.fold_in(key, i), cond[i * per:(i + 1) * per])
            np.testing.assert_allclose(
                vid[i * per:(i + 1) * per],
                np.asarray(ref["sample_out_vid"]), rtol=2e-5, atol=2e-5)

    def test_batch_divisibility_assert(self, devices):
        import __graft_entry__ as ge

        mesh = make_mesh(model=1, devices=devices[:4])
        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        sharded = fd.make_sharded_sampler(lfae_vars, unet_vars, mesh)
        bad = jnp.zeros((3, fd.cfg.cond_frames, 32, 32, 3), jnp.float32)
        with pytest.raises(AssertionError):
            sharded(jax.random.PRNGKey(0), bad)
