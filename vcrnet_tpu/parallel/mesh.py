"""Device-mesh data parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
(util/initPara.py:260): replicate the module, scatter the batch over local
GPUs, gather outputs. The TPU-native equivalent is a 1-D ``jax.sharding.Mesh``
over the 'data' axis: the batch is sharded, parameters are replicated, and
the gradient all-reduce falls out of jit's partitioner as a psum over ICI —
no explicit collectives, no process groups. Written mesh-first so multi-host
slices work unchanged.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))


def make_mesh_2d(
    n_batch: int, n_points: Optional[int] = None, devices=None
) -> Mesh:
    """2-D mesh for composed data x point (dp x sp) parallelism: the batch
    axis shards over the outer 'batch' mesh axis, the point axis over the
    inner 'data' axis. NOTE the inner axis keeps the name 'data' — the SP
    modules' collectives (parallel/point_sharding.py, sp_model.py,
    sp_flagship.py) are bound to that historical name; pass
    ``batch_axis='batch'`` to their public entry points to ride this mesh.
    Inner = point axis so SP's heavier all-gathers map to the
    faster-adjacent devices of a real slice (ICI before DCN)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_points is None:
        n_points = len(devs) // n_batch
    grid = np.asarray(devs[: n_batch * n_points]).reshape(n_batch, n_points)
    return Mesh(grid, axis_names=("batch", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with its leading axis sharded over devices."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def pad_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch axis so it divides the mesh (padding rows get
    valid=0 so metrics ignore them)."""
    lead = "src" if "src" in batch else next(iter(batch))
    b = batch[lead].shape[0]
    rem = b % multiple
    if rem == 0:
        return batch
    pad = multiple - rem
    out = {}
    for k, v in batch.items():
        out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
    if "valid" in out:
        out["valid"][-pad:] = 0.0
    return out
