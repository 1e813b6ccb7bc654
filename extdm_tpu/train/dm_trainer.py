"""Stage-2 (diffusion) trainer: one jitted SPMD train step.

Mirrors the reference loop semantics (scripts/DM/train.py:38-466): AdamW on
the diffusion/UNet parameters only (:94-101), MultiStepLR stepped per
iteration (:444), epsilon-loss as the only gradient source (:225-242 — the
rec losses there are no-grad monitors). The step is a single pjit program:
LFAE encode (frozen) -> q_sample -> UNet -> loss -> grads -> update, with
the batch sharded over the mesh 'data' axis and (optionally) kernels over
'model'.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from extdm_tpu.models.dm.flow_diffusion import FlowDiffusion
from extdm_tpu.train.lr_schedule import multi_step


def canonicalize_video(video: jnp.ndarray) -> jnp.ndarray:
    """In-graph equivalent of host-side `/255` + `to_rgb_video` for raw
    uint8 batches (data/video_dataset.py:17-31): the loader ships the
    stored uint8 layout — (B, T, H, W) gray or (B, T, H, W, 1|3) — at
    1/12th (gray) the f32-RGB bytes through the host->device tunnel, and
    the cast/broadcast happen on device. Float inputs pass through
    untouched (the classic host-canonicalized path)."""
    if jnp.issubdtype(video.dtype, jnp.integer):
        video = video.astype(jnp.float32) / 255.0
    if video.ndim == 4:
        video = video[..., None]
    if video.shape[-1] == 1:
        video = jnp.repeat(video, 3, axis=-1)
    return video


@struct.dataclass
class DMTrainState:
    step: jnp.ndarray
    unet_params: Any
    opt_state: Any




def make_optimizer(lr: float, milestones, gamma: float,
                   weight_decay: float = 0.01,
                   nan_guard: int = 0) -> optax.GradientTransformation:
    """AdamW(lr, default betas), MultiStepLR (ref :94-101,136).

    nan_guard > 0 enables failure detection the reference lacks (SURVEY
    §5: recovery = manual restart): a step with non-finite grads/params
    is skipped in-graph (no host sync, works under jit/shard_map), and
    training errors out after `nan_guard` consecutive bad steps instead
    of silently corrupting the params."""
    tx = optax.adamw(multi_step(lr, milestones, gamma), weight_decay=weight_decay)
    if nan_guard > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=nan_guard)
    return tx


def notfinite_count(opt_state) -> "jnp.ndarray | None":
    """Consecutive skipped-step counter when the optimizer was built with
    nan_guard (None otherwise) — surface it in training logs."""
    if hasattr(opt_state, "notfinite_count"):
        return opt_state.notfinite_count
    return None


class DMTrainer:
    def __init__(self, fd: FlowDiffusion, optimizer: optax.GradientTransformation):
        self.fd = fd
        self.tx = optimizer

    def init_state(self, unet_variables) -> DMTrainState:
        params = unet_variables["params"]
        return DMTrainState(
            step=jnp.zeros((), jnp.int32),
            unet_params=params,
            opt_state=self.tx.init(params),
        )

    def train_step(
        self,
        state: DMTrainState,
        lfae_variables,
        key: jax.Array,
        video: jnp.ndarray,
    ) -> Tuple[DMTrainState, Dict[str, jnp.ndarray]]:
        """video: (B, tc+tp, H, W, C) in [0,1], or raw uint8 in the stored
        layout (canonicalized in-graph). Pure function — jit/pjit me."""
        video = canonicalize_video(video)

        def loss_fn(params):
            loss, aux = self.fd.loss(
                lfae_variables, {"params": params}, key, video
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.unet_params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.unet_params)
        params = optax.apply_updates(state.unet_params, updates)
        new_state = DMTrainState(step=state.step + 1, unet_params=params, opt_state=opt_state)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    def jitted_train_step(self, donate: bool = True):
        return jax.jit(self.train_step, donate_argnums=(0,) if donate else ())

    def shard_mapped_train_step(self, mesh, donate: bool = True):
        """Data-parallel train step as an explicit shard_map over the mesh
        'data' axis: params/opt-state replicated, batch sharded, gradients
        pmean-ed over ICI. Unlike the GSPMD/pjit path, the body sees LOCAL
        shapes — so the pallas mega-kernels (ops/pallas_stw.py) run
        per-chip without XLA inserting resharding collectives around them.
        """
        from jax.sharding import PartitionSpec as P

        rep = P()
        data = P("data")

        def local_step(state, lfae_variables, key, video):
            video = canonicalize_video(video)
            # decorrelate per-shard diffusion timesteps / noise
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))

            def loss_fn(params):
                return self.fd.loss(lfae_variables, {"params": params}, key, video)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.unet_params)
            grads = jax.lax.pmean(grads, "data")
            aux = jax.lax.pmean(dict(aux), "data")
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.unet_params)
            params = optax.apply_updates(state.unet_params, updates)
            new_state = DMTrainState(step=state.step + 1, unet_params=params,
                                     opt_state=opt_state)
            aux["grad_norm"] = optax.global_norm(grads)
            return new_state, aux

        fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(rep, rep, rep, data),
            out_specs=(rep, rep),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
