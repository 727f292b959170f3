"""Multi-chip scaling over a ``jax.sharding.Mesh``.

The reference's only parallelism is shared-memory Hogwild threads
(gfasort ``src/sgd.rs:334-601``; SURVEY.md §2 "Parallelism &
communication").  The TPU-native replacement implemented here:

* **path-step arrays sharded data-parallel** across devices, aligned on
  path boundaries (both endpoints of every term live in the same shard
  — SURVEY.md §6 "Long-context" note), padded to equal shard sizes;
* **node position vector replicated** on every device;
* each round, every device samples its own batch of terms from its
  resident shard, computes distance-residual deltas, and the per-shard
  delta/count accumulators are merged with ``psum`` over the mesh —
  the ICI collective replacing the reference's racy atomic f64 writes.
"""

from .mesh import default_mesh, partition_paths  # noqa: F401
from .sgd_shard import (  # noqa: F401
    ShardedIndex,
    path_linear_sgd_sharded,
    path_sgd_sort_sharded,
)
from .sweep_shard import (  # noqa: F401
    path_linear_sgd_sweep_sharded,
    path_sgd_sort_sweep_sharded,
)
from .sweep_nd_shard import (  # noqa: F401
    path_linear_sgd_layout_sweep_sharded,
)
