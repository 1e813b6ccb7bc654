"""PyTorch-style default initializers.

torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) for weights — which
reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for the
bias. Keeping the same init distribution keeps from-scratch training
dynamics comparable with the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn
from jax import random

# variance_scaling(1/3, fan_in, uniform) ==> limit = sqrt(3*(1/3)/fan_in)
torch_kernel_init = jnn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
