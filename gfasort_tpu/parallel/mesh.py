"""Mesh construction and path partitioning for sharded SGD."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

__all__ = ["default_mesh", "partition_paths"]


def default_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    """A 1D device mesh over the first ``n_devices`` local devices."""
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
