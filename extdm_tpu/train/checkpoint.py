"""Checkpoint / resume.

Reference semantics (SURVEY §5): torch.save dicts — DM: {example, epoch,
diffusion, optimizer}; AE: {example, epoch, generator, bg_predictor,
region_predictor, optimizer}; rolling `flowdiff.pth`/`RegionMM.pth` +
FVD-gated `*_best_<fvd>.pth` copies; resume recomputes
start_step = ceil(example / batch_size).

Here: one msgpack file per checkpoint (flax.serialization) holding the
metadata and all pytrees; same cadences and best-gating implemented by the
training loops. Orbax-compatible directory layout is intentionally avoided
to keep checkpoints single-file and rsync-able.
"""
from __future__ import annotations

import math
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    # to_state_dict turns registered pytree nodes (train states, FrozenDicts)
    # into plain dicts that msgpack can serialize.
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """payload: dict of metadata scalars and pytrees."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic — a crash never corrupts the rolling ckpt


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template: Any, stored: Any) -> Any:
    """Re-shape a stored pytree onto a template (restores dtypes/devices)."""
    return serialization.from_state_dict(template, stored)


def start_step_from_example(example: int, batch_size: int) -> int:
    """ref: scripts/DM/train.py:111-116."""
    return int(math.ceil(example / batch_size))


def gate_best(path: str, best_dir: str, metric: float, prefix: str) -> str:
    """Copy `path` to {best_dir}/{prefix}_best_{metric:.3f} (FVD gating,
    ref scripts/DM/train.py:432-435). Returns the new path."""
    os.makedirs(best_dir, exist_ok=True)
    dst = os.path.join(best_dir, f"{prefix}_best_{metric:.3f}.ckpt")
    shutil.copyfile(path, dst)
    return dst


def select_gate_metric(vm: Dict[str, Any]) -> tuple:
    """Pick the best-checkpoint gating criterion for a validation dict.

    With a pretrained I3D, gate on FVD (lower is better) like the
    reference acceptance loop (ref scripts/DM/train.py:425-435). With a
    RANDOM-INIT I3D the feature space is degenerate: the deep random
    conv+ReLU+pool stack averages input differences away, so every clip
    maps to nearly the same 400-d activation (measured within-set feature
    std ~7e-5 on [0,1] video — data-independent bias/ReLU structure
    dominates). Real and fake Gaussians then coincide and FVD collapses
    to ~1e-4 ≈ 0.000 for EVERY checkpoint, so gating on it selects
    arbitrarily (round-2 trainruns gated on a constant 0.000). Fall back
    to SSIM, an absolute pixel metric that needs no backbone.

    Returns ``(sort_value, display_value, name)`` where ``sort_value``
    is uniformly lower-is-better (SSIM is negated), ``display_value`` is
    the raw metric for the best-checkpoint filename, and ``name`` is
    ``"fvd"`` or ``"ssim"``.
    """
    if vm.get("i3d_pretrained"):
        return float(vm["valid_fvd"]), float(vm["valid_fvd"]), "fvd"
    return -float(vm["valid_ssim"]), float(vm["valid_ssim"]), "ssim"
