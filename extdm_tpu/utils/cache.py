"""Persistent XLA compilation cache.

Compiles of the full sampling/training programs take minutes (and on the
tunneled TPU go through a remote compile service); caching them on disk
makes every process after the first start in seconds. Scripts and bench
call `enable_compilation_cache()` before the first jit.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get(
    "EXTDM_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "extdm_jax")
)


def enable_compilation_cache(path: str | None = None) -> str:
    # Honor JAX_PLATFORMS strictly: the environment's TPU plugin appends
    # itself to jax_platforms even when the env var says "cpu", which makes
    # nominally-CPU subprocesses contend for the (single-client) TPU.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
