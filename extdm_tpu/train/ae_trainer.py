"""Stage-1 (LFAE) trainer: one jitted SPMD train step.

Mirrors scripts/AE/train.py semantics: Adam(betas=(0.5, 0.999)) over all
three modules (+ optionally the reference's learnable scalar loss weights,
:101-115), MultiStepLR stepped per iteration, BatchNorm in train mode
(cross-replica by pjit construction). The reference's 3-device manual
module placement disappears into the mesh.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from extdm_tpu.models.lfae.recon_model import ReconstructionModel
from extdm_tpu.train.lr_schedule import multi_step


@struct.dataclass
class AETrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    loss_weights: Any  # dict of scalars or None
    opt_state: Any




def make_optimizer(lr: float, milestones, gamma: float,
                   nan_guard: int = 0) -> optax.GradientTransformation:
    """Adam(betas=(0.5, 0.999)) as ref scripts/AE/train.py:101-115;
    nan_guard skips non-finite steps in-graph (see dm_trainer)."""
    tx = optax.adam(multi_step(lr, milestones, gamma), b1=0.5, b2=0.999)
    if nan_guard > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=nan_guard)
    return tx


class AETrainer:
    def __init__(self, model: ReconstructionModel, optimizer: optax.GradientTransformation,
                 learnable_loss_weights: bool = False,
                 device_augment: "dict | None" = None):
        self.model = model
        self.tx = optimizer
        self.learnable = learnable_loss_weights
        # {"flip_param": ..., "jitter_param": ...} -> the loader ships raw
        # uint8 pairs and the flip/jitter chain runs in-graph (see
        # train/device_augment.py). None -> host-augmented f32 batches
        # pass through (uint8 batches are still canonicalized in-graph).
        self.device_augment = device_augment

    def init_state(self, variables) -> AETrainState:
        params = variables["params"]
        lw = None
        if self.learnable:
            lw = {k: jnp.ones(()) for k in
                  ("perceptual", "equivariance_shift", "equivariance_affine", "reconstruction")}
        opt_target = (params, lw) if self.learnable else params
        return AETrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            loss_weights=lw,
            opt_state=self.tx.init(opt_target),
        )

    def _total_loss(self, losses: Dict[str, jnp.ndarray], lw) -> jnp.ndarray:
        total = 0.0
        for k, v in losses.items():
            w = lw[k] if (lw is not None and k in lw) else 1.0
            total = total + w * v
        return total

    def train_step(
        self, state: AETrainState, key: jax.Array, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[AETrainState, Dict[str, jnp.ndarray]]:
        from extdm_tpu.train.device_augment import prepare_batch

        akey, key = jax.random.split(key)
        batch = prepare_batch(batch, akey, self.device_augment)

        def loss_fn(params, lw):
            (losses, _generated), mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                rngs={"tps": key},
                mutable=["batch_stats"],
            )
            total = self._total_loss(losses, lw)
            return total, (losses, mutated["batch_stats"])

        if self.learnable:
            (total, (losses, new_stats)), grads = jax.value_and_grad(
                lambda t: loss_fn(t[0], t[1]), has_aux=True
            )((state.params, state.loss_weights))
            target = (state.params, state.loss_weights)
        else:
            (total, (losses, new_stats)), grads = jax.value_and_grad(
                lambda p: loss_fn(p, None), has_aux=True
            )(state.params)
            target = state.params

        updates, opt_state = self.tx.update(grads, state.opt_state, target)
        new_target = optax.apply_updates(target, updates)
        if self.learnable:
            params, lw = new_target
        else:
            params, lw = new_target, None

        new_state = AETrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            loss_weights=lw,
            opt_state=opt_state,
        )
        aux = dict(losses)
        aux["loss_total"] = total
        return new_state, aux

    def jitted_train_step(self, donate: bool = True):
        return jax.jit(self.train_step, donate_argnums=(0,) if donate else ())

    def shard_mapped_train_step(self, mesh, donate: bool = True):
        """Explicit data-parallel AE step over the mesh 'data' axis:
        params/opt-state replicated, batch sharded, grads pmean-ed, and
        BatchNorm statistics reduced cross-replica via `sync_bn_axis`
        (true SyncBN — the reference vendors
        Synchronized-BatchNorm-PyTorch for this, SURVEY §2.7). The body
        sees LOCAL shapes, so per-chip kernels run unchanged."""
        from jax.sharding import PartitionSpec as P

        from extdm_tpu.nn.layers import sync_bn_axis

        rep, data = P(), P("data")

        def local_step(state, key, batch):
            from extdm_tpu.train.device_augment import prepare_batch

            # decorrelate per-shard TPS equivariance transforms (and the
            # per-shard augmentation draws)
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            akey, key = jax.random.split(key)
            batch = prepare_batch(batch, akey, self.device_augment)

            def loss_fn(params, lw):
                with sync_bn_axis("data"):
                    (losses, _generated), mutated = self.model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch,
                        rngs={"tps": key},
                        mutable=["batch_stats"],
                    )
                # per-item losses pmean to the global-batch mean
                losses = jax.lax.pmean(losses, "data")
                return self._total_loss(losses, lw), (losses,
                                                      mutated["batch_stats"])

            if self.learnable:
                (total, (losses, new_stats)), grads = jax.value_and_grad(
                    lambda t: loss_fn(t[0], t[1]), has_aux=True
                )((state.params, state.loss_weights))
                target = (state.params, state.loss_weights)
            else:
                (total, (losses, new_stats)), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, None), has_aux=True
                )(state.params)
                target = state.params
            grads = jax.lax.pmean(grads, "data")
            updates, opt_state = self.tx.update(grads, state.opt_state, target)
            new_target = optax.apply_updates(target, updates)
            params, lw = (new_target if self.learnable else (new_target, None))
            new_state = AETrainState(step=state.step + 1, params=params,
                                     batch_stats=new_stats, loss_weights=lw,
                                     opt_state=opt_state)
            aux = dict(losses)
            aux["loss_total"] = total
            return new_state, aux

        fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(rep, rep, data), out_specs=(rep, rep),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
