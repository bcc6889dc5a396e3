"""Multi-host (multi-process) execution support.

The reference is strictly single-machine — its only parallelism is
``nn.DataParallel`` over local GPUs (reference util/initPara.py:260,
SURVEY C26/C27). The TPU-native production layout for anything larger
than one host is SPMD: one process per host, each seeing only its local
chips, all running the SAME jit program over one global
``jax.sharding.Mesh``. jit handles the compute and collectives; the two
pieces it does not handle are (a) runtime bring-up and (b) feeding each
process only its shard of the batch. This module supplies both:

* :func:`initialize` — ``jax.distributed.initialize`` bring-up from the
  standard env vars / TPU metadata, a no-op when single-process, so the
  same entry point works on a laptop, one chip, or a pod slice.
* :func:`local_batch_slice` — the rows of a global host batch this
  process is responsible for (every process iterates the dataset in the
  same order, keeps only its slice — no inter-host data service needed).
* :func:`global_batch_from_local` — assemble the GLOBAL batch-sharded
  device arrays from each process's LOCAL rows via
  ``jax.make_array_from_process_local_data``. At ``process_count()==1``
  this is exactly ``device_put`` with the same sharding (tested
  equivalent on the 8-device CPU mesh), so the Trainer can route through
  it unconditionally when more than one process is present.

The jitted step functions in ``train/engine.py`` need no changes: their
``in_shardings`` already describe the global layout, and XLA emits the
same program per host.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from vcrnet_tpu.parallel.mesh import batch_sharding


def initialize(**kwargs) -> bool:
    """Bring up the JAX distributed runtime if this looks like a
    multi-process launch; return True when multi-process.

    ``jax.distributed.initialize`` is attempted when (a) the caller
    passes explicit kwargs, (b) the environment announces a process
    count > 1 (JAX_NUM_PROCESSES / NUM_PROCESSES), or (c) TPU pod
    metadata markers are present (TPU_PROCESS_ADDRESSES /
    TPU_WORKER_HOSTNAMES / MEGASCALE_COORDINATOR_ADDRESS) — the case
    where JAX auto-detects the coordinator itself. Initialization
    failures PROPAGATE (a misconfigured pod job must fail loudly, not
    silently train one divergent model per host); only the idempotent
    "already initialized" case is tolerated. Single-process runs with
    none of the markers are a clean no-op.
    """
    import os

    announced_raw = os.environ.get(
        "JAX_NUM_PROCESSES", os.environ.get("NUM_PROCESSES", "")
    ).strip()
    announced = int(announced_raw) if announced_raw.isdigit() else 1
    # single-host TPU setups also define these (e.g. TPU_WORKER_HOSTNAMES=
    # localhost on this very container); only a MULTI-worker value — a
    # comma-separated list, or a megascale coordinator — means a pod
    pod_markers = (
        "," in os.environ.get("TPU_PROCESS_ADDRESSES", "")
        or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    )
    should_init = (
        bool(kwargs)
        or kwargs.get("num_processes", announced) > 1
        or pod_markers
    )
    if not should_init:
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_count() > 1


def local_batch_slice(
    batch: dict,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> dict:
    """Rows of a (padded) global host batch owned by this process.

    The batch's leading axis must divide process_count — the engine pads
    to a mesh-size multiple first (``pad_to_multiple``), and the mesh
    size is a multiple of the process count on any real slice.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return batch
    out = {}
    for key, val in batch.items():
        b = val.shape[0]
        if b % pc:
            raise ValueError(
                f"batch axis {b} does not divide process_count {pc}; "
                "pad to a mesh-size multiple first"
            )
        per = b // pc
        out[key] = val[pi * per:(pi + 1) * per]
    return out


def global_batch_from_local(local_batch: dict, mesh, global_b: int) -> dict:
    """Assemble global batch-sharded arrays from per-process local rows.

    ``local_batch`` holds this process's ``global_b / process_count()``
    rows (from :func:`local_batch_slice`); the result is a dict of global
    jax.Arrays sharded over the mesh's 'data' axis, indistinguishable
    from ``device_put`` of the full batch with the same sharding.
    """
    sharding = batch_sharding(mesh)
    out = {}
    for key, val in local_batch.items():
        val = np.asarray(val)
        global_shape = (global_b,) + val.shape[1:]
        out[key] = jax.make_array_from_process_local_data(
            sharding, val, global_shape
        )
    return out
