"""Determinism helpers.

The reference seeds torch/cuda/np/random and sets cudnn.deterministic
(utils/seed.py:5-9). In JAX, determinism is structural: all randomness
flows through explicit PRNG keys. `setup_seed` seeds the host-side numpy/
python RNGs (data pipeline, augmentations) and returns the root jax key.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
