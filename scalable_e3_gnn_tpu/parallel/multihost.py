"""Multi-host execution scaffolding: jax.distributed init + hosts×chips mesh.

The capability spec (BASELINE.json:5) measures edges/s at 1 chip / 1 host /
N≥2 hosts with ≥85% scaling efficiency.  TPU-natively that is NOT an MPI/NCCL
launcher: every process runs the same program, ``jax.distributed.initialize``
wires the processes into one runtime, and the global mesh spans all chips —
XLA routes collectives over ICI within a slice and DCN across slices.

Mesh layout for halo exchange: spatial partitions are Morton-contiguous node
ranges (parallel/partition.py), so partition p exchanges mostly with p±1.
``make_hosts_mesh`` therefore lays the 'graph' axis out in ``jax.devices()``
order (process-major): consecutive partitions land on the same host wherever
possible, and only the partition-range boundaries that coincide with host
boundaries cross DCN — the halo all_gather volume over DCN is O(P_hosts), not
O(P_chips).

Single-process fallback: everything degenerates gracefully so the same
script runs on one chip, on a CPU device farm (XLA_FLAGS=
--xla_force_host_platform_device_count=8), and on a real multi-host slice.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["init_distributed", "make_hosts_mesh", "local_shard_slice",
           "global_put"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime; no-op for single-process.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can configure via env.
    On TPU pods with modern JAX, ``jax.distributed.initialize()`` with no
    arguments auto-detects everything; we keep explicit args for CPU
    multi-process smoke tests.  Returns True iff a multi-process runtime was
    initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hosts_mesh(
    dp: int = 1,
    axis_names: Sequence[str] = ("dp", "graph"),
    devices=None,
) -> Mesh:
    """Global (dp, graph) mesh over all devices of all processes.

    The 'graph' (spatial-partition) axis runs over devices in global
    ``jax.devices()`` order — process-major, so Morton-adjacent partitions
    stay intra-host (ICI) except at host boundaries (DCN).  ``dp`` splits off
    a leading data-parallel axis; it must divide the device count.  With
    ``dp == 1`` the mesh is effectively 1-D and compatible with the
    ``axis='graph'`` distributed entry points.
    """
    devs = list(jax.devices() if devices is None else devices)
    n = len(devs)
    if n % dp:
        raise ValueError(f"dp={dp} does not divide device count {n}")
    arr = np.array(devs).reshape(dp, n // dp)
    return Mesh(arr, tuple(axis_names))


def local_shard_slice(num_parts: int, mesh: Mesh, axis: str = "graph"):
    """(lo, hi) partition indices this process owns on the mesh axis.

    Multi-host data feeding: each process materializes only its slice of the
    stacked partition arrays (``DensePartitionedGraph`` rows lo:hi) and
    assembles the global array with ``jax.make_array_from_process_local_data``
    — the 10M-point configs never materialize fully on any single host.
    """
    axis_devs = np.moveaxis(
        mesh.devices, list(mesh.axis_names).index(axis), 0
    ).reshape(mesh.shape[axis], -1)
    pid = jax.process_index()
    mine = [i for i in range(axis_devs.shape[0])
            if axis_devs[i, 0].process_index == pid]
    if not mine:
        return 0, 0
    per = num_parts // mesh.shape[axis]
    assert num_parts % mesh.shape[axis] == 0, (num_parts, mesh.shape)
    return mine[0] * per, (mine[-1] + 1) * per


def global_put(x, mesh: Mesh, spec):
    """device_put that is multi-process-safe.

    Single-process: plain ``jax.device_put``.  Multi-process: a
    ``jax.device_put`` onto a sharding with non-addressable devices is
    invalid (observed to SEGFAULT in the XLA:CPU/Gloo backend, r4) — build
    the global array with ``make_array_from_callback`` instead: every
    process supplies only its addressable shards, sliced from the
    (host-replicated) input.
    """
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    xnp = np.asarray(x)
    return jax.make_array_from_callback(xnp.shape, sh, lambda idx: xnp[idx])
