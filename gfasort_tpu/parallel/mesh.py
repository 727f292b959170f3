"""Mesh construction and path partitioning for sharded SGD.

Single-process multi-device AND multi-host: ``init_distributed`` wires
``jax.distributed`` (pod slices, or multi-process CPU via Gloo for
testing), after which ``default_mesh``/``global_mesh`` span every
process's devices and the sharded engines run unchanged — their only
collective is the consensus ``psum``, which XLA lowers to ICI
all-reduce within a slice and DCN across slices.  See
docs/MULTIHOST.md for the launch recipe; tests/test_multihost.py runs
a real 2-process x 4-device CPU mesh end-to-end.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "default_mesh",
    "global_mesh",
    "init_distributed",
    "is_distributed",
    "partition_paths",
]

_DIST_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` for a multi-host run.

    Arguments default to the ``GFASORT_COORDINATOR`` /
    ``GFASORT_NUM_PROCESSES`` / ``GFASORT_PROCESS_ID`` environment
    variables; on TPU pods all three may be omitted entirely (the TPU
    runtime provides them).  Safe to call more than once.  After this,
    ``jax.devices()`` lists the GLOBAL device set and the sharded
    engines run unchanged over :func:`global_mesh`.
    """
    global _DIST_INITIALIZED
    import jax

    if _DIST_INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "GFASORT_COORDINATOR"
    )
    if num_processes is None and "GFASORT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GFASORT_NUM_PROCESSES"])
    if process_id is None and "GFASORT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GFASORT_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _DIST_INITIALIZED = True


def is_distributed() -> bool:
    """True when this process is part of an initialized multi-process
    run (``jax.process_count() > 1``)."""
    import jax

    return jax.process_count() > 1


def default_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    """A 1D device mesh over the first ``n_devices`` devices.  In a
    distributed run, devices are the GLOBAL set (all processes) — a
    process-spanning mesh is the default, matching the engines'
    SPMD shard_map programs."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def global_mesh(axis: str = "data"):
    """Mesh over every device of every process (alias of
    ``default_mesh()`` with no device cap, named for intent)."""
    return default_mesh(None, axis)


def partition_paths(step_counts: Sequence[int], n_shards: int) -> List[List[int]]:
    """Greedy longest-processing-time assignment of paths to shards,
    balancing total step count.  Pairs never span shards because whole
    paths stay together (a term's two endpoints are always in the same
    path — src/sgd.rs:502-506)."""
    order = np.argsort(np.asarray(step_counts))[::-1]
    loads = [0] * n_shards
    shards: List[List[int]] = [[] for _ in range(n_shards)]
    for p in order.tolist():
        s = int(np.argmin(loads))
        shards[s].append(p)
        loads[s] += int(step_counts[p])
    return shards
