"""LR schedules.

- `multi_step`: torch MultiStepLR (the one both reference loops use —
  scripts/DM/train.py:136,444; scripts/AE/train.py).
- warmup cosine/linear lambdas mirroring utils/lr_scheduler.py:4-80
  (present-but-unused in the reference; exposed for completeness).
"""
from __future__ import annotations

import math
from typing import Sequence

import optax


def multi_step(base_lr: float, milestones: Sequence[int], gamma: float) -> optax.Schedule:
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  min_ratio: float = 0.0) -> optax.Schedule:
    def fn(step):
        import jax.numpy as jnp

        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        prog = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_ratio + (1 - min_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * prog))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return fn


def warmup_linear(base_lr: float, warmup_steps: int, total_steps: int,
                  min_ratio: float = 0.0) -> optax.Schedule:
    def fn(step):
        import jax.numpy as jnp

        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        prog = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        lin = 1 - (1 - min_ratio) * prog
        return base_lr * jnp.where(step < warmup_steps, warm, lin)

    return fn
