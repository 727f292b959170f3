"""Multi-device nD layout SGD: local sweeps + psum node-end consensus.

The layout twin of :mod:`gfasort_tpu.parallel.sweep_shard` for the `L`
pipeline step (reference hot loop: gfasort ``src/sgd.rs:988-1156``,
Hogwild threads over one coordinate array).  Shards are path-aligned
([ndev, 2*D, L] coordinate state), so no term pair crosses a shard;
the only collective is the periodic per-(node, end, dim) consensus:

* grid consensus (ops/grid_consensus.py) when band locality allows —
  per-shard window sums, ONE psum of the [2D, n_pad] raw-sum block,
  broadcast back through the shared one-hot; or
* scatter fallback — per-row scatter-add into the replicated
  [2D, N] node block, psum, gather back.

Either way the collective volume is O(2*D*N), independent of step
count — the multi-chip scaling story for BASELINE config 4
(3D/nD multi-chip layout).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph import BidirectedGraph
from ..index import PathIndex
from ..io.layout_tsv import Layout
from ..params import LayoutSGDParams
from ..ops.fastpow import zeta_table
from ..ops.schedule import eta_schedule
from ..ops.sweep import offset_set
from ..ops.sweep_common import (auto_sweep_config, fit_consensus_period,
                                phase_structure)
from ..ops.sweep_nd import make_nd_sweep_fn
from .mesh import default_mesh
from .sweep_shard import _shard_arrays, _shard_grid_plans

__all__ = [
    "build_sharded_sweep_nd",
    "path_linear_sgd_layout_sweep_sharded",
]


def build_sharded_sweep_nd(
    pidx: PathIndex,
    params: LayoutSGDParams,
    mesh,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
):
    """Returns (run, placed_arrays, make_state, info); run(cs_sh,
    cs_node_init, key, *arrays) executes the full layout schedule under
    shard_map and returns the [2D, N] node-end coordinates."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    (axis,) = mesh.axis_names
    ndev = mesh.size

    dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    fdt = {np.float32: jnp.float32, np.float64: jnp.float64}[dtype]
    S = pidx.total_steps
    N = pidx.num_nodes
    D = int(params.dimensions)

    pos_np, rank_np, cnt_np, node_np, path_np, L = _shard_arrays(
        pidx, ndev, dtype
    )
    grid = _shard_grid_plans(node_np, path_np, N, L, dtype, rows=2 * D)

    # per-shard rev / node-length rows (dead slots: rev 0, len 0)
    rev_np = np.zeros((ndev, L), dtype=np.int32)
    len_np = np.zeros((ndev, L), dtype=dtype)
    live = node_np >= 0
    rev_src = (pidx.step_handle & 1).astype(np.int32)
    # _shard_arrays packs paths contiguously; rebuild the same packing
    # for the per-step handle bits and lengths via the node map
    len_np[live] = pidx.node_len[node_np[live]].astype(dtype)
    # rev bit needs the original step identity; recover through the
    # shard assignment (same traversal as _shard_arrays)
    from .mesh import partition_paths

    assignment = partition_paths(pidx.path_count.tolist(), ndev)
    for d, paths in enumerate(assignment):
        off = 0
        for p in paths:
            f = int(pidx.path_first[p])
            c = int(pidx.path_count[p])
            rev_np[d, off : off + c] = rev_src[f : f + c]
            off += c

    # shape-aware defaults; consensus period scaled by shard length
    # like the 1D sharded engine (sweep_shard.shard_consensus_every)
    from .sweep_shard import shard_consensus_every

    _auto = auto_sweep_config(S, N, layout=True)
    if per_octave is None:
        per_octave = _auto["per_octave"]
    if consensus_every is None:
        consensus_every = shard_consensus_every(
            L, _auto["consensus_every"], S
        )
    if active_frac is None:
        active_frac = _auto["active_frac"]
    if rotate is None:
        rotate = _auto["rotate"]
    if dense_upto is None:
        dense_upto = _auto.get("dense_upto", 8)
    if proposals is None:
        proposals = _auto.get("proposals", 1)
    PP = max(1, int(proposals))

    max_jump = max(1, min(int(params.space), pidx.max_path_step_count - 1))
    offs = offset_set(max_jump, per_octave, dense_upto)
    K = len(offs)
    n_dense = int((offs <= 8).sum())

    # bucket rotation (see ops/sweep.py and sweep_common.phase_structure)
    phase_offsets, rotate, consensus_every = phase_structure(
        offs, rotate, consensus_every
    )

    # multi-proposal sweeps (r5, see ops/sweep_nd.py)
    updates_per_sweep = PP * max(1, int(S * active_frac))

    etas = eta_schedule(
        1.0 / params.eta_max, 1.0, params.iter_max,
        params.iter_with_max_learning_rate, params.eps,
    )
    spi = max(1, -(-params.min_term_updates // updates_per_sweep))
    sweep_eta = np.repeat(etas, spi)
    sweep_cool = np.repeat(
        np.arange(params.iter_max + 1) > params.first_cooling_iteration, spi
    )
    n_sweeps = len(sweep_eta)
    # minimize the whole-period execution padding (see
    # sweep_common.fit_consensus_period): periods run fully with the
    # sweep index clamped, so fit ce to the schedule length
    consensus_every = fit_consensus_period(
        n_sweeps, consensus_every, len(phase_offsets)
    )
    etas_j = jnp.asarray(sweep_eta, dtype=fdt)
    cool_j = jnp.asarray(sweep_cool)

    zetas = zeta_table(
        params.space, params.space_max, params.space_quantization_step,
        params.theta,
    )

    sweep_fns = [
        make_nd_sweep_fn(po_, L, D, params, zetas, fdt, active_frac,
                         dense_vma=frozenset({axis}), proposals=PP)
        for po_ in phase_offsets
    ]

    cnt_node = np.bincount(pidx.step_node_idx, minlength=N)
    inv_cnt_np = (1.0 / np.maximum(cnt_node, 1)).astype(dtype)
    has_steps_np = cnt_node > 0

    if grid is not None:
        OFF = grid["off"]

        def consensus(cs, node_a, w_a, inv_cnt_a, *cons):
            """Grid consensus over the 2D rows with ONE [2D, n_pad]
            psum between fwd and bwd (the only collective per period)."""
            lidx_d, anchors_d, oob_s_d, oob_n_d = cons
            ssum = grid["fwd"](cs, lidx_d, anchors_d, oob_s_d, oob_n_d)
            ssum = jax.lax.psum(ssum, axis)
            x_node = (ssum[:, OFF : OFF + N] * inv_cnt_a[None, :]).astype(
                cs.dtype
            )
            cs_new = grid["bwd"](
                x_node, cs, lidx_d, anchors_d, oob_s_d, oob_n_d
            )
            return cs_new, x_node
    else:

        def consensus(cs, node_a, w_a, inv_cnt_a, *cons):
            idx = jnp.maximum(node_a, 0)
            rows = [
                jax.lax.psum(
                    jnp.zeros(N, cs.dtype).at[idx].add(cs[r] * w_a), axis
                )
                for r in range(2 * D)
            ]
            x_node = jnp.stack([r_ * inv_cnt_a for r_ in rows], axis=0)
            cs_new = jnp.stack(
                [jnp.where(w_a > 0, x_node[r][idx], cs[r])
                 for r in range(2 * D)],
                axis=0,
            )
            return cs_new, x_node

    import os as _os

    n_periods = -(-n_sweeps // consensus_every)
    budget = int(_os.environ.get("GFASORT_SWEEP_DISPATCH_ELEMS", 5e8)) // 2
    chunk_periods = max(1, min(n_periods, budget // max(L * consensus_every, 1)))
    n_dispatch = -(-n_periods // chunk_periods)

    # ONE shard_map program (no separate finish — see ops/sweep.py on
    # the backend's fixed per-program remote-compile overhead)
    def device_chunk(cs, p0, base_key, cs_node_init, pos, rank_a, cnt_a,
                     rev_a, len_a, node_a, inv_cnt_a, has_steps_a, *cons):
        cs, pos, rank_a, cnt_a, rev_a, len_a, node_a = (
            cs[0], pos[0], rank_a[0], cnt_a[0], rev_a[0], len_a[0], node_a[0]
        )
        cons = tuple(c[0] for c in cons)
        w_a = (node_a >= 0).astype(cs.dtype)
        dev = jax.lax.axis_index(axis)
        base = jax.random.fold_in(base_key, dev)

        # rotation: Python-unroll ONE rotation block (each phase once),
        # fori_loop over blocks — traces each phase body once per
        # program, not once per period slot (see ops/sweep.py); no
        # lax.cond (see ops/sweep_common.py)
        n_phase = len(sweep_fns)
        n_rot = consensus_every // n_phase

        def outer(i, carry):
            cs, _ = carry
            p_idx = p0 + i

            def rot_block(j, cs):
                for rr in range(n_phase):
                    idx = p_idx * consensus_every + j * n_phase + rr
                    r = jnp.minimum(idx, n_sweeps - 1)
                    key = jax.random.fold_in(base, idx)
                    cs = sweep_fns[rr](
                        cs, key, etas_j[r], cool_j[r], pos, rank_a, cnt_a,
                        rev_a, len_a
                    )
                return cs

            cs = (rot_block(jnp.int32(0), cs) if n_rot == 1
                  else jax.lax.fori_loop(0, n_rot, rot_block, cs))
            return consensus(cs, node_a, w_a, inv_cnt_a, *cons)

        cs, xn = jax.lax.fori_loop(
            0, chunk_periods, outer, (cs, jnp.zeros_like(cs_node_init))
        )
        # stepless nodes keep their initial coordinates
        return cs[None], jnp.where(has_steps_a[None, :], xn, cs_node_init)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    n_cons = 4 if grid is not None else 0
    cons_specs = (P(axis),) * n_cons
    run_chunk = jax.jit(
        shard_map(
            device_chunk,
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(), P()) + cons_specs,
            out_specs=(P(axis), P()),
        ),
        donate_argnums=(0,),
    )

    def run(cs, cs_node_init, base_key, pos, rank_a, cnt_a, rev_a, len_a,
            node_a, inv_cnt_a, has_steps_a, *cons):
        for d in range(n_dispatch):
            cs, xn = run_chunk(
                cs, jnp.int32(d * chunk_periods), base_key, cs_node_init,
                pos, rank_a, cnt_a, rev_a, len_a, node_a, inv_cnt_a,
                has_steps_a, *cons,
            )
        return xn

    arrays = tuple(
        jax.device_put(jnp.asarray(a), shard)
        for a in (pos_np, rank_np, cnt_np, rev_np, len_np, node_np)
    ) + (
        jax.device_put(jnp.asarray(inv_cnt_np), repl),
        jax.device_put(jnp.asarray(has_steps_np), repl),
    ) + (
        tuple(jax.device_put(jnp.asarray(a), shard) for a in grid["arrays"])
        if grid is not None else ()
    )

    def make_state(init_node_coords: np.ndarray):
        """init_node_coords [2N, D] -> ([ndev, 2D, L] sharded step
        state, [2D, N] replicated node-order init)."""
        nc = np.asarray(init_node_coords, dtype=dtype).reshape(N, 2, D)
        cs0 = np.zeros((ndev, 2 * D, L), dtype=dtype)
        per_node_rows = np.ascontiguousarray(
            nc.transpose(1, 2, 0).reshape(2 * D, N)
        )
        for d in range(ndev):
            lv = node_np[d] >= 0
            cs0[d][:, lv] = per_node_rows[:, node_np[d][lv]]
        return (
            jax.device_put(jnp.asarray(cs0), shard),
            jax.device_put(jnp.asarray(per_node_rows), repl),
        )

    info = {
        "n_sweeps": n_sweeps, "updates_per_sweep": updates_per_sweep,
        "proposals": PP,
        "active_frac": active_frac, "n_offsets": K, "shard_len": L,
        "rotate": rotate, "consensus_every": consensus_every,
        "grid_consensus": grid is not None,
    }
    return run, arrays, make_state, info


def path_linear_sgd_layout_sweep_sharded(
    graph: Optional[BidirectedGraph],
    params: LayoutSGDParams,
    mesh=None,
    pidx: Optional[PathIndex] = None,
    init_coords: Optional[np.ndarray] = None,
    **kw,
) -> Layout:
    """Multi-device nD layout; same output contract as
    :func:`gfasort_tpu.ops.sweep_nd.path_linear_sgd_layout_sweep`."""
    import jax

    pidx = pidx or PathIndex.from_graph(graph)
    n = pidx.num_nodes
    dims = params.dimensions
    if n == 0:
        return Layout(dims, 0)
    if not pidx.has_multi_step_path():
        return Layout(dims, n)

    if init_coords is None:
        from ..ops.exact import layout_initial_coords

        init_coords = layout_initial_coords(pidx, dims, params.seed)

    mesh = mesh or default_mesh()
    run, arrays, make_state, info = build_sharded_sweep_nd(
        pidx, params, mesh, **kw
    )
    cs0, cs_node0 = make_state(init_coords)
    x_node = run(cs0, cs_node0, jax.random.key(params.seed), *arrays)
    xn = np.asarray(jax.device_get(x_node), dtype=np.float64)
    state = np.ascontiguousarray(
        xn.reshape(2, dims, n).transpose(2, 0, 1).reshape(2 * n, dims)
    )
    return Layout.from_state(state)
