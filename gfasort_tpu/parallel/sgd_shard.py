"""Sharded 1D path SGD: step arrays sharded over a mesh, positions
replicated, per-round deltas merged with psum.

This is the multi-host/multi-chip scaling design from SURVEY.md §2
("TPU-native equivalents" table) realized with ``shard_map``:

* paths are partitioned to shards (whole paths — terms never cross a
  shard boundary), each shard's step arrays padded to a common length;
* the position vector ``x [N]`` is replicated; every device runs the
  same ``lax.fori_loop`` over rounds;
* per round, a device samples ``B_local`` step slots from its own pad­
  ded shard (pad slots are masked invalid, which keeps the combined
  per-step sampling probability uniform across unequal shards), gathers
  positions, computes distance-residual deltas, and scatter-adds into a
  local ``[N]`` accumulator;
* delta and collision-count accumulators are ``psum``-merged over the
  mesh and applied to the replicated ``x`` — every device deterministic­
  ally computes the same new ``x``, so no re-broadcast is needed.

Collectives ride ICI within a slice / DCN across slices — placement is
XLA's job once the mesh and shardings are declared.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..graph import BidirectedGraph
from ..index import PathIndex
from ..params import PathSGDParams
from ..ops.fastpow import zeta_table
from ..ops.sgd import build_schedule, effective_batch, _pow_builder
from .mesh import default_mesh, partition_paths

__all__ = ["ShardedIndex", "path_linear_sgd_sharded", "path_sgd_sort_sharded"]


@dataclass(frozen=True)
class ShardedIndex:
    """Per-shard padded path-index arrays, stacked on a leading mesh
    axis.  Pad slots have ``step_node == -1``."""

    step_rank: np.ndarray     # [D, L] int32
    step_pos: np.ndarray      # [D, L] float
    step_node: np.ndarray     # [D, L] int32 (-1 = pad)
    step_first: np.ndarray    # [D, L] int32: shard-local first-step of the slot's path
    step_count: np.ndarray    # [D, L] int32: step count of the slot's path
    num_nodes: int
    shard_len: int

    @classmethod
    def build(cls, pidx: PathIndex, n_shards: int, dtype=np.float32) -> "ShardedIndex":
        assignment = partition_paths(pidx.path_count.tolist(), n_shards)
        shard_sizes = [
            int(sum(pidx.path_count[p] for p in paths)) for paths in assignment
        ]
        L = max(max(shard_sizes), 1)

        ranks = np.zeros((n_shards, L), dtype=np.int32)
        poss = np.zeros((n_shards, L), dtype=dtype)
        nodes = np.full((n_shards, L), -1, dtype=np.int32)
        firsts = np.zeros((n_shards, L), dtype=np.int32)
        counts = np.ones((n_shards, L), dtype=np.int32)

        for d, paths in enumerate(assignment):
            off = 0
            for p in paths:
                f = int(pidx.path_first[p])
                c = int(pidx.path_count[p])
                sl = slice(off, off + c)
                ranks[d, sl] = pidx.step_rank[f : f + c]
                poss[d, sl] = pidx.step_pos[f : f + c]
                nodes[d, sl] = pidx.step_node_idx[f : f + c]
                firsts[d, sl] = off
                counts[d, sl] = c
                off += c
        return cls(
            step_rank=ranks, step_pos=poss, step_node=nodes,
            step_first=firsts, step_count=counts,
            num_nodes=pidx.num_nodes, shard_len=L,
        )


def path_linear_sgd_sharded(
    graph: BidirectedGraph,
    params: PathSGDParams,
    mesh=None,
    pidx: Optional[PathIndex] = None,
    x0: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Multi-device 1D path SGD.  Returns final positions (host numpy)
    or None when no multi-step path exists."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    pidx = pidx or PathIndex.from_graph(graph)
    if pidx.num_nodes == 0:
        return np.zeros(0)
    if not pidx.has_multi_step_path():
        return None

    mesh = mesh or default_mesh()
    (axis,) = mesh.axis_names
    ndev = mesh.size

    dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    fdt = {np.float32: jnp.float32, np.float64: jnp.float64}[dtype]
    sample_dtype = jnp.float64 if params.pow_mode == "fpp" else fdt
    if params.pow_mode == "fpp" and not jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", True)

    sidx = ShardedIndex.build(pidx, ndev, dtype)
    zetas = zeta_table(
        params.space, params.space_max, params.space_quantization_step,
        params.theta,
    )
    B_total = effective_batch(params)
    B_local = max(1, -(-B_total // ndev))
    round_eta, round_cooling, _rpi, n_rounds = build_schedule(params, B_local * ndev)

    powf = _pow_builder(params.pow_mode, sample_dtype)
    theta0 = float(params.theta)
    theta_cool = 0.001
    alpha_e0 = int(1.0 / (1.0 - theta0)) if theta0 != 1.0 else 0
    alpha_e1 = int(1.0 / (1.0 - theta_cool))
    space = int(params.space)
    space_max = int(params.space_max)
    quant = int(params.space_quantization_step)
    L = sidx.shard_len
    N = sidx.num_nodes

    zetas_j = jnp.asarray(zetas, dtype=sample_dtype)
    etas_r = jnp.asarray(round_eta, dtype=fdt)
    cool_r = jnp.asarray(round_cooling)

    def zipf_ranks(u, jump_space, theta, alpha_e):
        n = jnp.maximum(jump_space, 1).astype(sample_dtype)
        si = jnp.minimum(
            jnp.where(
                jump_space > space_max,
                space_max + (jump_space - space_max) // quant + 1,
                jump_space,
            ),
            len(zetas) - 1,
        )
        zeta = zetas_j[si]
        zeta2theta = 1.0 + powf(jnp.asarray(0.5, sample_dtype), theta, 0)
        alpha = 1.0 / (1.0 - theta)
        eta_z = (1.0 - powf(2.0 / n, 1.0 - theta, 0)) / (1.0 - zeta2theta / zeta)
        uz = u * zeta
        general = 1.0 + n * powf(eta_z * u - eta_z + 1.0, alpha, alpha_e)
        general = jnp.where(jnp.isnan(general), 0.0, general)
        g = jnp.clip(general, 0.0, n).astype(jnp.int32)
        z = jnp.where(uz < 1.0, 1, jnp.where(uz < zeta2theta, 2, g))
        return jnp.minimum(z, jump_space)

    def device_round(x, key, eta, cooling, rank_l, pos_l, node_l, first_l, count_l):
        """One round on one device: local sampling + local delta, then
        psum merge.  All *_l arrays are the device's local shard [L]."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        slot = jax.random.randint(k1, (B_local,), 0, L, dtype=jnp.int32)
        node_a = node_l[slot]
        cnt = count_l[slot]
        rank_a = rank_l[slot]
        first = first_l[slot]

        coin1 = jax.random.bernoulli(k2, 0.5, (B_local,))
        use_zipf = cooling | coin1
        coin2 = jax.random.bernoulli(k3, 0.5, (B_local,))
        backward = (rank_a > 0) & (coin2 | (rank_a == cnt - 1))
        forward = (~backward) & (rank_a < cnt - 1)
        avail = jnp.where(backward, rank_a, cnt - 1 - rank_a)
        jump_space = jnp.minimum(space, avail)
        u = jax.random.uniform(k4, (B_local,), dtype=sample_dtype)
        z = jax.lax.cond(
            cooling,
            lambda: zipf_ranks(u, jump_space, jnp.asarray(theta_cool, sample_dtype), alpha_e1),
            lambda: zipf_ranks(u, jump_space, jnp.asarray(theta0, sample_dtype), alpha_e0),
        )
        rank_b_zipf = jnp.where(
            backward,
            rank_a - jnp.minimum(z, rank_a),
            jnp.where(forward, jnp.minimum(rank_a + z, cnt - 1), rank_a),
        )
        rank_b_unif = jax.random.randint(
            k5, (B_local,), 0, jnp.maximum(cnt, 1), dtype=jnp.int32
        )
        rank_b = jnp.where(use_zipf, rank_b_zipf, rank_b_unif)

        slot_b = first + rank_b
        pos_a = pos_l[slot]
        pos_b = pos_l[slot_b]
        node_b = node_l[slot_b]
        term_dist = jnp.abs(pos_a - pos_b)
        valid = (node_a >= 0) & (cnt != 1) & (rank_a != rank_b) & (term_dist != 0)
        safe_dist = jnp.where(valid, term_dist, 1.0)
        mu = jnp.minimum(eta / safe_dist, 1.0)
        i = jnp.maximum(node_a, 0)
        j = jnp.maximum(node_b, 0)
        dx = x[i] - x[j]
        dx = jnp.where(dx == 0, fdt(1e-9), dx)
        mag = jnp.abs(dx)
        delta = mu * (mag - safe_dist) / 2.0
        r_x = jnp.where(valid, (delta / mag) * dx, fdt(0))
        one = valid.astype(x.dtype)
        dsum = jnp.zeros_like(x).at[i].add(-r_x).at[j].add(r_x)
        cnt_acc = jnp.zeros_like(x).at[i].add(one).at[j].add(one)
        # merge shard contributions over the mesh — the psum replacing
        # the reference's shared-memory atomics
        dsum = jax.lax.psum(dsum, axis)
        cnt_acc = jax.lax.psum(cnt_acc, axis)
        return x + dsum / jnp.maximum(cnt_acc, 1)

    def device_run(x, rank_l, pos_l, node_l, first_l, count_l):
        # x arrives replicated [N]; shard arrays arrive [1, L] — squeeze.
        rank_l = rank_l[0]
        pos_l = pos_l[0]
        node_l = node_l[0]
        first_l = first_l[0]
        count_l = count_l[0]
        dev = jax.lax.axis_index(axis)
        base = jax.random.fold_in(jax.random.key(params.seed), dev)

        def body(r, x):
            key = jax.random.fold_in(base, r)
            return device_round(
                x, key, etas_r[r], cool_r[r],
                rank_l, pos_l, node_l, first_l, count_l,
            )

        return jax.lax.fori_loop(0, n_rounds, body, x)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    run = jax.jit(
        shard_map(
            device_run,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(),
        ),
        donate_argnums=(0,),
    )

    x_init = jax.device_put(
        jnp.asarray(x0 if x0 is not None else pidx.initial_positions(), dtype=fdt),
        repl,
    )
    args = [
        jax.device_put(jnp.asarray(a), shard)
        for a in (sidx.step_rank, sidx.step_pos, sidx.step_node,
                  sidx.step_first, sidx.step_count)
    ]
    x_final = run(x_init, *args)
    return np.asarray(jax.device_get(x_final), dtype=np.float64)


def path_sgd_sort_sharded(graph: BidirectedGraph, params: PathSGDParams, mesh=None):
    from .. import handle as H

    pidx = PathIndex.from_graph(graph)
    x = path_linear_sgd_sharded(graph, params, mesh, pidx)
    if x is None or len(x) == 0:
        return []
    order = np.argsort(x, kind="stable")
    return [H.forward(int(pidx.node_ids[idx])) for idx in order]
