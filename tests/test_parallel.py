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


class TestHybridDCNMesh:
    def test_hybrid_mesh_shapes_and_batch_spec(self, devices):
        from extdm_tpu.parallel import batch_sharding, make_hybrid_mesh

        mesh = make_hybrid_mesh(dcn=2, model=2, devices=devices)
        assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
        assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec(
            ("dcn", "data"))
        # TP rule unchanged: kernels over 'model' only, never 'dcn'
        sharded = shard_params(
            {"layer": {"kernel": jnp.zeros((256, 64))}}, mesh)
        assert sharded["layer"]["kernel"].sharding.spec == \
            jax.sharding.PartitionSpec(None, "model")

    def test_hybrid_step_matches_plain_mesh(self, devices):
        """The (dcn, data, model) step is the SAME logical program as the
        (data, model) step — identical loss and updated params; only the
        physical layout (which collectives ride DCN vs ICI) differs."""
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        from extdm_tpu.parallel import make_hybrid_mesh
        from extdm_tpu.train.dm_trainer import DMTrainer, make_optimizer

        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        trainer = DMTrainer(fd, make_optimizer(1e-4, [100], 0.5))
        video = jnp.asarray(
            np.random.RandomState(0).rand(4, 4, 32, 32, 3), np.float32)

        def run(mesh):
            state = trainer.init_state(unet_vars)
            params = shard_params(state.unet_params, mesh)
            state = type(state)(step=state.step, unet_params=params,
                                opt_state=trainer.tx.init(params))
            lv = jax.device_put(lfae_vars, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
            vid = shard_batch(video, mesh)
            with mesh:
                new_state, aux = jax.jit(trainer.train_step)(
                    state, lv, jax.random.PRNGKey(1), vid)
                jax.block_until_ready(new_state.unet_params)
            return float(aux["loss"]), new_state.unet_params

        hy_loss, hy_params = run(make_hybrid_mesh(dcn=2, model=2,
                                                  devices=devices))
        pl_loss, pl_params = run(make_mesh(model=2, devices=devices))
        assert np.isfinite(hy_loss)
        np.testing.assert_allclose(hy_loss, pl_loss, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(hy_params),
                        jax.tree_util.tree_leaves(pl_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


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


class TestSpatialSampler:
    def test_matches_plain_sampler(self, devices):
        """Spatial (sequence-parallel) sampler == plain sampler: the GSPMD
        partitioning of the DDIM stage over (data=2, model=2) — batch AND
        latent-H sharded — must change nothing but float accumulation
        order (halo exchanges + stat all-reduces are inserted by XLA)."""
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        mesh = make_mesh(data=2, model=2, devices=devices[:4])
        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        tc = fd.cfg.cond_frames

        B = 4
        cond = jnp.asarray(
            np.random.RandomState(1).rand(B, tc, 32, 32, 3), np.float32)
        key = jax.random.PRNGKey(11)

        plain = fd.make_sampler(lfae_vars, unet_vars)
        ref = plain(key, cond)

        spatial = fd.make_spatial_sampler(lfae_vars, unet_vars, mesh)
        out = spatial(key, cond)

        for k in ("sample_vid_grid", "sample_out_vid"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=2e-4)

    def test_pure_spatial_mesh(self, devices):
        """data axis of size 1: the whole batch on every shard, H split 4-way."""
        import __graft_entry__ as ge

        mesh = make_mesh(data=1, model=4, devices=devices[:4])
        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        cond = jnp.asarray(
            np.random.RandomState(2).rand(2, fd.cfg.cond_frames, 32, 32, 3),
            np.float32)
        out = fd.make_spatial_sampler(lfae_vars, unet_vars, mesh)(
            jax.random.PRNGKey(3), cond)
        vid = np.asarray(out["sample_out_vid"])
        assert vid.shape == (2, fd.cfg.cond_frames + fd.cfg.pred_frames, 32, 32, 3)
        assert np.isfinite(vid).all()


class TestSyncBN:
    def test_shard_map_bn_matches_global_batch(self, devices):
        """BatchNorm under shard_map + sync_bn_axis == single-device
        global-batch BN: same outputs and same updated running stats
        (the reference's SyncBN contract, sync_batchnorm/batchnorm.py)."""
        import flax.linen as nn

        from extdm_tpu.nn.layers import BatchNorm, sync_bn_axis
        from jax.sharding import PartitionSpec as P

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return BatchNorm(use_running_average=False)(x)

        m = M()
        x = jnp.asarray(np.random.RandomState(0).rand(16, 6, 6, 5), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x[:2])

        ref_out, ref_mut = m.apply(variables, x, mutable=["batch_stats"])

        mesh = make_mesh(model=1, devices=devices)  # 8-way data

        def body(v, xl):
            with sync_bn_axis("data"):
                return m.apply(v, xl, mutable=["batch_stats"])

        fn = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=(P("data"), P()), check_vma=False))
        out, mut = fn(variables, x)

        # pmean-of-moments vs one global reduction: same math, different
        # float accumulation order
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-4, atol=1e-5)
        ref_stats = jax.tree_util.tree_leaves(ref_mut["batch_stats"])
        got_stats = jax.tree_util.tree_leaves(mut["batch_stats"])
        for a, b in zip(got_stats, ref_stats):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestAEShardMapStep:
    def test_ae_dp_step(self, devices):
        from extdm_tpu.models.lfae import ReconstructionModel
        from extdm_tpu.train.ae_trainer import AETrainer, make_optimizer

        model = ReconstructionModel(
            region_predictor_cfg=dict(block_expansion=8, max_features=32,
                                      num_blocks=2, scale_factor=0.5, pad=0),
            bg_predictor_cfg=dict(block_expansion=8, max_features=32,
                                  num_blocks=2, bg_type="affine"),
            generator_cfg=dict(
                block_expansion=8, max_features=32, num_down_blocks=2,
                num_bottleneck_blocks=1, skips=True,
                pixelwise_flow_predictor_params=dict(
                    block_expansion=8, max_features=32, num_blocks=2,
                    scale_factor=0.5, use_deformed_source=True,
                    use_covar_heatmap=True, estimate_occlusion_map=True)),
            num_regions=3,
            loss_weights=dict(perceptual=[1, 1, 1, 1, 1],
                              equivariance_shift=10,
                              equivariance_affine=10, reconstruction=1),
            transform_params=dict(sigma_affine=0.05, sigma_tps=0.005,
                                  points_tps=5),
            scales=(1.0, 0.5),
        )
        mesh = make_mesh(model=1, devices=devices[:4])
        rs = np.random.RandomState(0)
        batch = {
            "source": jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
            "driving": jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "tps": jax.random.PRNGKey(1)},
            jax.tree_util.tree_map(lambda a: a[:2], batch))
        trainer = AETrainer(model, make_optimizer(1e-4, [100], 0.5))
        state = trainer.init_state(variables)
        batch = jax.tree_util.tree_map(lambda a: shard_batch(a, mesh), batch)
        step = trainer.shard_mapped_train_step(mesh, donate=False)
        new_state, aux = step(state, jax.random.PRNGKey(2), batch)
        assert np.isfinite(float(aux["loss_total"]))
        assert int(new_state.step) == 1
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestMeshPortableRestore:
    def test_checkpoint_crosses_mesh_shapes(self, devices, tmp_path):
        """A checkpoint written under a (4,2) (data, model) GSPMD run
        restores into an (8,1) DP shard_map run and vice versa (VERDICT
        r3 #7): save_checkpoint gathers to host numpy, restore_like
        re-places onto whatever template sharding the consumer uses."""
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        from extdm_tpu.train import (load_checkpoint, restore_like,
                                     save_checkpoint)
        from extdm_tpu.train.dm_trainer import DMTrainer, make_optimizer

        fd = ge._tiny_fd()
        lfae_vars, unet_vars = fd.init_variables(jax.random.PRNGKey(0))
        trainer = DMTrainer(fd, make_optimizer(1e-4, [100], 0.5))

        # --- phase A: one step under the (4,2) model-parallel mesh ------
        mesh_a = make_mesh(model=2, devices=devices)  # (4, 2)
        state = trainer.init_state(unet_vars)
        sharded = shard_params(state.unet_params, mesh_a)
        state = type(state)(step=state.step, unet_params=sharded,
                            opt_state=trainer.tx.init(sharded))
        lfae_a = jax.device_put(lfae_vars, jax.sharding.NamedSharding(
            mesh_a, jax.sharding.PartitionSpec()))
        video = jnp.asarray(
            np.random.RandomState(0).rand(8, 4, 32, 32, 3), np.float32)
        with mesh_a:
            state_a, _ = jax.jit(trainer.train_step)(
                state, lfae_a, jax.random.PRNGKey(1), shard_batch(video, mesh_a))
            jax.block_until_ready(state_a.unet_params)
        ck = str(tmp_path / "a.ckpt")
        save_checkpoint(ck, {"example": 8, "state": state_a})

        # --- restore A's ckpt into an (8,1) DP run ----------------------
        mesh_b = make_mesh(devices=devices)  # (8, 1)
        state_b = trainer.init_state(unet_vars)
        state_b = restore_like(state_b, load_checkpoint(ck)["state"])
        state_b = jax.device_put(state_b, jax.sharding.NamedSharding(
            mesh_b, jax.sharding.PartitionSpec()))
        assert int(state_b.step) == 1
        # restored values match what phase A computed
        la = np.asarray(jax.tree_util.tree_leaves(state_a.unet_params)[0])
        lb = np.asarray(jax.tree_util.tree_leaves(state_b.unet_params)[0])
        np.testing.assert_array_equal(la, lb)
        step_b = trainer.shard_mapped_train_step(mesh_b, donate=False)
        state_b2, aux_b = step_b(state_b, jax.device_put(
            lfae_vars, jax.sharding.NamedSharding(
                mesh_b, jax.sharding.PartitionSpec())),
            jax.random.PRNGKey(2), shard_batch(video, mesh_b))
        assert np.isfinite(float(aux_b["loss"]))
        assert int(state_b2.step) == 2

        # --- and back: B's ckpt into a fresh (4,2) GSPMD run ------------
        ck2 = str(tmp_path / "b.ckpt")
        save_checkpoint(ck2, {"example": 16, "state": state_b2})
        state_c = trainer.init_state(unet_vars)
        state_c = restore_like(state_c, load_checkpoint(ck2)["state"])
        sharded_c = shard_params(state_c.unet_params, mesh_a)
        state_c = type(state_c)(step=state_c.step, unet_params=sharded_c,
                                opt_state=jax.tree_util.tree_map(
                                    lambda x: x, state_c.opt_state))
        assert int(state_c.step) == 2
        with mesh_a:
            state_c2, aux_c = jax.jit(trainer.train_step)(
                state_c, lfae_a, jax.random.PRNGKey(3),
                shard_batch(video, mesh_a))
            jax.block_until_ready(state_c2.unet_params)
        assert np.isfinite(float(aux_c["loss"]))
        assert int(state_c2.step) == 3
