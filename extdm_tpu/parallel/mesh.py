"""Device mesh + sharding helpers.

The reference's parallelism inventory (SURVEY §2.7) — manual 2-3 GPU model
placement, vestigial DataParallel, vendored SyncBN — collapses on TPU to:

- a (data, model) `jax.sharding.Mesh`;
- batch sharded over 'data' (data parallelism; XLA all-reduces grads);
- large kernels optionally sharded over 'model' (tensor parallelism via
  GSPMD propagation);
- BatchNorm statistics are global-batch by construction under pjit
  (== SyncBN), no message-passing machinery needed.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D (data, model) mesh. `data` defaults to n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_hybrid_mesh(
    dcn: int = 2,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """3-D (dcn, data, model) mesh for multi-slice pods.

    Layout rule (scaling-book recipe): pure data parallelism over the
    slow inter-slice DCN axis — exactly ONE gradient all-reduce per step
    crosses DCN — while 'data' DP and 'model' TP stay within a slice so
    their collectives (grad all-reduce segments, TP all-gathers, SyncBN
    pmeans) ride ICI. The batch's leading axis is sharded over the
    combined ('dcn', 'data') axes (see `batch_sharding`); the TP rule
    (`_param_spec`) is unchanged — kernels split over 'model' only.

    On real multi-slice hardware (devices report distinct
    `.slice_index`), the device grid is built with
    `mesh_utils.create_hybrid_device_mesh` so the major axis truly maps
    to slices. Anywhere else (single slice, CPU dryrun) a plain reshape
    stands in — the sharding program is identical, only the physical
    link speeds differ. Run under `jax.distributed.initialize()` on
    multi-host; mesh construction is the same either way.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % (dcn * model) == 0, f"{n} devices !% dcn={dcn} x model={model}"
    data = n // (dcn * model)
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) > 1 and None not in slice_ids:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model), dcn_mesh_shape=(dcn, 1, 1),
            devices=devices)
    else:
        arr = np.asarray(devices).reshape(dcn, data, model)
    return Mesh(arr, ("dcn", "data", "model"))


def make_data_mesh(batch_size: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data mesh over the most devices the global batch divides.

    Training scripts default to DP over every visible device; a batch
    that doesn't divide the device count (e.g. batch 2 on a 4-chip
    host) must fall back to fewer devices instead of a device_put error.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = min(len(devices), max(1, batch_size))
    while batch_size % n:
        n -= 1
    if n < len(devices):
        print(f"data mesh: batch {batch_size} not divisible by "
              f"{len(devices)} devices; using {n}")
    return make_mesh(data=n, model=1, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch spec: over 'data', plus 'dcn' on hybrid meshes."""
    if "dcn" in mesh.shape:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put every array leaf with its leading axis split over 'data'."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def _param_spec(path: Tuple, value, mesh: Mesh, min_size: int = 2048) -> P:
    """Tensor-parallel rule: shard the output-channel (last) axis of large
    kernels over 'model' when divisible; everything else is replicated.
    GSPMD propagates the rest (activations, optimizer state)."""
    model_size = mesh.shape.get("model", 1)
    if model_size <= 1:
        return P()
    shape = getattr(value, "shape", ())
    if len(shape) < 2 or value.size < min_size:
        return P()
    name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
    if name not in ("kernel", "embedding"):
        return P()
    if shape[-1] % model_size == 0:
        return P(*((None,) * (len(shape) - 1) + ("model",)))
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply the TP rule to a parameter pytree, returning device arrays."""

    def put(path, x):
        spec = _param_spec(path, x, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """The NamedSharding tree matching `shard_params` (for jit in/out specs)."""

    def spec(path, x):
        return NamedSharding(mesh, _param_spec(path, x, mesh))

    return jax.tree_util.tree_map_with_path(spec, params)
