"""Multi-device offset-sweep SGD: local sweeps + psum consensus.

The sweep engine (:mod:`gfasort_tpu.ops.sweep`) decomposes perfectly
over a mesh: with path-aligned contiguous shards no term pair ever
crosses a shard boundary (both endpoints of a pair are in one path),
so each device sweeps its resident shard with ZERO communication; the only
collective is the periodic node consensus, where per-shard (sum, count)
accumulators over the replicated node space are ``psum``-merged — a
[N]-sized all-reduce every ``consensus_every`` sweeps, riding ICI.

This is the scaling story for BASELINE metric 4 (≥80% efficiency
1 → N hosts): compute is embarrassingly parallel and the collective
volume is independent of step count.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph import BidirectedGraph
from ..index import PathIndex
from ..params import PathSGDParams
from ..ops.fastpow import zeta_table
from ..ops.schedule import eta_schedule
from ..ops.sweep_common import (auto_sweep_config, fit_consensus_period,
                                phase_structure)
from ..ops.sweep import offset_set
from .mesh import default_mesh, partition_paths

__all__ = ["path_linear_sgd_sweep_sharded", "path_sgd_sort_sweep_sharded",
           "build_sharded_sweep"]

# Steps a shard should process between consensus collectives so the
# fixed psum cost stays amortized (strong-scaling knob, VERDICT r3
# task 7).  Derivation (docs/SCALING.md §4): the collective is
# ~0.1-0.6 ms at 256 chips regardless of shard length, while shard
# compute per period is ce · S_shard / rate (rate ~1.5e9 upd/s/chip at
# frac=1).  Keeping the collective <= 1/4 of compute (>= 80%
# efficiency) at the worst-case 0.6 ms needs ce·S_shard >= 4 · 0.6e-3
# · 1.5e9 ~= 3.6e6; the default targets 4M with ce capped at 384
# (certifications have been flat-to-better at every larger period
# probed; the cap bounds staleness).
PSUM_AMORT_STEPS = 4_000_000
CE_CAP = 384


def shard_consensus_every(L: int, base_ce: int, S_total: int) -> int:
    """Consensus period for shard length ``L``: at least the
    single-chip auto period, raised so ce·L covers PSUM_AMORT_STEPS,
    capped at CE_CAP.  Moves the strong-scaling 80% crossing from
    S_shard ~= 60k (fixed ce=8) to ~= PSUM_AMORT_STEPS/CE_CAP ~= 10k
    steps/shard.

    Only applies in the large regime (total steps >= LARGE_S): on
    small graphs the whole run is milliseconds, collective cost is
    irrelevant, and frequent cross-shard mixing is what quality rides
    on (a 15-node fixture split over 2 shards lost oracle-grade
    stress at ce=384 — r4 measurement)."""
    from ..ops.sweep_common import LARGE_S

    if S_total < LARGE_S:
        return int(base_ce)
    need = -(-PSUM_AMORT_STEPS // max(L, 1))
    return int(np.clip(need, base_ce, CE_CAP))


def _shard_arrays(pidx: PathIndex, n_shards: int, dtype):
    """Per-shard padded step arrays [D, L] in path-contiguous layout.
    Pad slots: cnt=1 (never active), node=-1 (masked in consensus),
    path=-1."""
    assignment = partition_paths(pidx.path_count.tolist(), n_shards)
    sizes = [int(sum(pidx.path_count[p] for p in paths)) for paths in assignment]
    L = max(max(sizes), 1)

    pos = np.zeros((n_shards, L), dtype=dtype)
    rank = np.zeros((n_shards, L), dtype=np.int32)
    cnt = np.ones((n_shards, L), dtype=np.int32)
    node = np.full((n_shards, L), -1, dtype=np.int32)
    path = np.full((n_shards, L), -1, dtype=np.int32)

    for d, paths in enumerate(assignment):
        off = 0
        for p in paths:
            f = int(pidx.path_first[p])
            c = int(pidx.path_count[p])
            sl = slice(off, off + c)
            pos[d, sl] = pidx.step_pos[f : f + c]
            rank[d, sl] = pidx.step_rank[f : f + c]
            cnt[d, sl] = c
            node[d, sl] = pidx.step_node_idx[f : f + c]
            path[d, sl] = p
            off += c
    return pos, rank, cnt, node, path, L


def _shard_grid_plans(node_np, path_np, N, L, dtype, rows: int = 1):
    """Grid-consensus plans for every shard on one shared geometry, or
    None when locality is poor (see ops/sweep.select_consensus).  All
    shards share (T, SL, D, W, n_seg, n_oob_pad) so one shard_map
    program serves every device; per-shard lidx/anchors/oob are data."""
    import os

    from ..ops.grid_consensus import (
        choose_grid_geometry,
        make_grid_fns,
        plan_grid,
    )

    mode = os.environ.get("GFASORT_CONSENSUS", "auto")
    if mode == "gather" or np.dtype(dtype) != np.float32:
        return None
    T, SL = 256, 32
    flat_node = node_np.reshape(-1)
    flat_path = path_np.reshape(-1)
    live = flat_node >= 0
    D, W, m = choose_grid_geometry(
        flat_node[live], T, SL, 4096, flat_path[live]
    )
    if W > 4096:
        return None
    plans = [
        plan_grid(node_np[d], N, T, SL, D, W, path_of_step=path_np[d])
        for d in range(node_np.shape[0])
    ]
    total_live = int(live.sum())
    in_band = sum(p.coverage * L for p in plans)  # plan coverage is /L
    coverage = in_band / max(total_live, 1)
    if mode != "grid" and coverage < 0.97:
        return None
    n_oob_pad = max(len(p.oob_steps) for p in plans)
    g = -(-L // T)
    n_seg = -(-g // SL)
    lidx = np.stack([p.lidx for p in plans])
    anchors = np.stack([p.anchors for p in plans])
    oob_s = np.stack([
        np.concatenate([p.oob_steps,
                        np.full(n_oob_pad - len(p.oob_steps), p.S_pad,
                                np.int32)])
        for p in plans
    ])
    oob_n = np.stack([
        np.concatenate([p.oob_nodes,
                        np.full(n_oob_pad - len(p.oob_nodes), N, np.int32)])
        for p in plans
    ])
    fwd, bwd, n_pad = make_grid_fns(L, N, T, SL, D, W, n_seg, rows=rows)
    return {
        "fwd": fwd, "bwd": bwd, "off": SL * D, "coverage": coverage,
        "arrays": (lidx, anchors, oob_s, oob_n), "window": W, "stride": D,
    }


def build_sharded_sweep(
    pidx: PathIndex,
    params: PathSGDParams,
    mesh,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
    expose_parts: bool = False,
):
    """Returns (run, placed_arrays, make_state, info); run(xs_sh,
    x_node0, key, *arrays) executes the full schedule under shard_map.

    ``expose_parts=True`` additionally puts two jitted single-period
    programs in ``info["parts"]`` for scaling diagnostics
    (bench_scaling.py, VERDICT r4 task 7):
    ``sweeps_fn(xs, key, *arrays)`` runs ONE consensus period of
    sweeps WITHOUT the collective; ``period_fn`` runs the same period
    WITH it — their wall-time difference isolates the per-period
    collective cost on the mesh."""
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

    pos_np, rank_np, cnt_np, node_np, path_np, L = _shard_arrays(
        pidx, ndev, dtype
    )
    grid = _shard_grid_plans(node_np, path_np, N, L, dtype)

    # shape-aware defaults (sweep_common.auto_sweep_config), with the
    # consensus period additionally scaled by SHARD length: small
    # shards afford (and need, for psum amortization) rarer consensus
    _auto = auto_sweep_config(S, N)
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

    # multi-proposal sweeps (r5, see ops/sweep.py): P independent
    # partner draws per step per sweep share one bucket pass
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

    from ..ops.sweep_common import make_offset_sampler
    from ..ops.sweep_dense import (
        build_bucket_apply,
        dense_kernel_enabled,
        kernel_kmax,
    )

    # fused small-offset bucket kernel per shard (ops/sweep_dense.py):
    # runs unchanged inside shard_map on each device's local [L] arrays
    use_dense = dense_kernel_enabled(dtype, L, n_dense)

    def make_local_sweep(offs_p: np.ndarray):
        offs_p = np.asarray(offs_p)
        Kp = len(offs_p)
        _, _, sample_block = make_offset_sampler(offs_p, params, zetas, fdt)
        if use_dense:
            kmax = kernel_kmax()
            kbuckets = [(int(offs_p[ki]), ki) for ki in range(Kp)
                        if offs_p[ki] <= kmax]
            bucket_apply = build_bucket_apply(
                kbuckets, L, fdt, vma=frozenset({axis}), proposals=PP
            )
            served = {ki for _, ki in kbuckets}
        else:
            bucket_apply = None
            served = set()

        def local_sweep(xs, key, eta, cooling, pos, rank_a, cnt_a):
            from ..ops.sweep_common import pack_choices_words, sweep_rng

            if PP == 1:
                bits, u = sweep_rng(key, L, fdt)
                sidxs = [sample_block(
                    bits, u, cooling, rank_a, cnt_a, active_frac)]
            else:
                bu = [sweep_rng(jax.random.fold_in(key, pi), L, fdt)
                      for pi in range(PP)]
                # bit-identical to PP sample_block calls (shared
                # direction-constant chains, sweep_common.sample_blocks)
                sidxs = sample_block.multi(
                    bu, cooling, rank_a, cnt_a, active_frac)

            iota = jax.lax.iota(jnp.int32, L)
            if bucket_apply is not None:
                sidx_k = (sidxs[0] if PP == 1
                          else pack_choices_words(sidxs))
                dsum, csum = bucket_apply(xs, pos, sidx_k, eta)
            else:
                dsum = jnp.zeros_like(xs)
                csum = jnp.zeros_like(xs)
            for ki in range(Kp):
                if ki in served:
                    continue
                k = int(offs_p[ki])

                def half(shift, pairs):
                    # in-path validity comes from the sampler's offset
                    # clamp (shards are path-aligned, so a path never
                    # spans shards); only the per-shard roll wraparound
                    # needs guarding (see ops/sweep.py)
                    pos_o = jnp.roll(pos, shift)
                    xs_o = jnp.roll(xs, shift)
                    guard = iota < L + shift if shift < 0 else iota >= shift
                    w = None
                    for w_mine, w_theirs in pairs:
                        wb = (w_mine | (w_theirs & guard)).astype(xs.dtype)
                        w = wb if w is None else w + wb
                    d = jnp.abs(pos - pos_o)
                    valid = d != 0
                    w = jnp.where(valid, w, fdt(0.0))
                    safe = jnp.where(valid, d, 1.0)
                    mu = jnp.minimum(eta / safe, 1.0)
                    dx = xs - xs_o
                    dx = jnp.where(dx == 0, fdt(1e-9), dx)
                    mag = jnp.abs(dx)
                    # dx/|dx| = sign: one divide per half (see
                    # ops/sweep.py / ops/sweep_dense.py)
                    half_sgn = jnp.where(dx >= 0, fdt(0.5), fdt(-0.5))
                    r_x = mu * (mag - safe) * half_sgn
                    return -w * r_x, w

                d1, w1 = half(-k, [(s == ki, jnp.roll(s, -k) == ~ki)
                                   for s in sidxs])
                d2, w2 = half(+k, [(s == ~ki, jnp.roll(s, +k) == ki)
                                   for s in sidxs])
                dsum = dsum + d1 + d2
                csum = csum + w1 + w2
            return xs + dsum / jnp.maximum(csum, 1)

        return local_sweep

    sweep_fns = [make_local_sweep(po_) for po_ in phase_offsets]

    # per-node step counts are static (the shard->node map never
    # changes): the count scatter AND its psum are hoisted to the host,
    # leaving one scatter-add + one [N] psum per consensus (same
    # optimization as the single-chip engine)
    live_nodes = node_np[node_np >= 0]
    cnt_total = np.bincount(live_nodes.astype(np.int64), minlength=N)
    inv_cnt_np = (1.0 / np.maximum(cnt_total, 1)).astype(dtype)
    has_steps_np = cnt_total > 0

    if grid is not None:
        OFF = grid["off"]

        def consensus(xs, node_a, w_a, inv_cnt_a, *cons):
            """Grid consensus with the psum between fwd and bwd: local
            window sums -> [n_pad] all-reduce -> broadcast back.  The
            only collective per period, riding ICI."""
            lidx_d, anchors_d, oob_s_d, oob_n_d = cons
            ssum = grid["fwd"](xs, lidx_d, anchors_d, oob_s_d, oob_n_d)
            ssum = jax.lax.psum(ssum, axis)
            x_node = (ssum[OFF : OFF + N] * inv_cnt_a).astype(xs.dtype)
            xs_new = grid["bwd"](
                x_node, xs, lidx_d, anchors_d, oob_s_d, oob_n_d
            )
            return xs_new, x_node
    else:

        def consensus(xs, node_a, w_a, inv_cnt_a, *cons):
            """psum-merged scatter-mean over the replicated node space."""
            idx = jnp.maximum(node_a, 0)
            ssum = jnp.zeros(N, xs.dtype).at[idx].add(xs * w_a)
            ssum = jax.lax.psum(ssum, axis)
            x_node = ssum * inv_cnt_a
            return jnp.where(w_a > 0, x_node[idx], xs), x_node

    # Bounded-dispatch chunking (see ops/sweep.py): split the schedule
    # into dispatches of at most `chunk_periods` periods so no single
    # XLA program runs long enough to trip the worker watchdog; the
    # absolute period index is a traced scalar, so one compiled program
    # serves every dispatch.  Per-device cost scales with the shard
    # length L, not S.
    import os as _os

    n_periods = -(-n_sweeps // consensus_every)
    budget = int(_os.environ.get("GFASORT_SWEEP_DISPATCH_ELEMS", 5e8))
    chunk_periods = max(1, min(n_periods, budget // max(L * consensus_every, 1)))
    n_dispatch = -(-n_periods // chunk_periods)

    # ONE shard_map program (no separate finish — every distinct
    # program pays the backend's ~60-80 s fixed remote-compile
    # overhead, see ops/sweep.py): the chunk carries the psum'd node
    # means and applies the stepless-node passthrough itself.
    def device_chunk(xs, p0, base_key, x_node_init, pos, rank_a, cnt_a,
                     node_a, inv_cnt_a, has_steps_a, *cons):
        xs, pos, rank_a, cnt_a, node_a = (
            xs[0], pos[0], rank_a[0], cnt_a[0], node_a[0]
        )
        cons = tuple(c[0] for c in cons)
        w_a = (node_a >= 0).astype(xs.dtype)
        dev = jax.lax.axis_index(axis)
        base = jax.random.fold_in(base_key, dev)

        # nested loops, not lax.cond (cond copies captured operands
        # every iteration — see ops/sweep_common.py rules)
        if len(sweep_fns) == 1:
            def inner(rr, carry):
                p_idx, xs = carry
                r = jnp.minimum(p_idx * consensus_every + rr, n_sweeps - 1)
                key = jax.random.fold_in(base, p_idx * consensus_every + rr)
                xs = sweep_fns[0](xs, key, etas_j[r], cool_j[r], pos, rank_a, cnt_a)
                return (p_idx, xs)

            def outer(i, carry):
                xs, _ = carry
                p_idx = p0 + i
                _, xs = jax.lax.fori_loop(0, consensus_every, inner, (p_idx, xs))
                return consensus(xs, node_a, w_a, inv_cnt_a, *cons)
        else:
            # rotation: Python-unroll ONE rotation block (each phase
            # once), fori_loop over blocks — traces each phase body
            # once per program, not once per period slot (see
            # ops/sweep.py)
            n_phase = len(sweep_fns)
            n_rot = consensus_every // n_phase

            def outer(i, carry):
                xs, _ = carry
                p_idx = p0 + i

                def rot_block(j, xs):
                    for rr in range(n_phase):
                        idx = p_idx * consensus_every + j * n_phase + rr
                        r = jnp.minimum(idx, n_sweeps - 1)
                        key = jax.random.fold_in(base, idx)
                        xs = sweep_fns[rr](
                            xs, key, etas_j[r], cool_j[r], pos, rank_a, cnt_a
                        )
                    return xs

                xs = (rot_block(jnp.int32(0), xs) if n_rot == 1
                      else jax.lax.fori_loop(0, n_rot, rot_block, xs))
                return consensus(xs, node_a, w_a, inv_cnt_a, *cons)

        xs, xn = jax.lax.fori_loop(
            0, chunk_periods, outer,
            (xs, jnp.zeros_like(x_node_init)),
        )
        return xs[None], jnp.where(has_steps_a, xn, x_node_init)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    n_cons = 4 if grid is not None else 0
    cons_specs = (P(axis),) * n_cons
    run_chunk = jax.jit(
        shard_map(
            device_chunk,
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P(axis), P(axis), P(axis),
                      P(axis), P(), P()) + cons_specs,
            out_specs=(P(axis), P()),
        ),
        donate_argnums=(0,),
    )

    def run(xs, x_node_init, base_key, pos, rank_a, cnt_a, node_a,
            inv_cnt_a, has_steps_a, *cons):
        for d in range(n_dispatch):
            xs, xn = run_chunk(
                xs, jnp.int32(d * chunk_periods), base_key, x_node_init,
                pos, rank_a, cnt_a, node_a, inv_cnt_a, has_steps_a, *cons,
            )
        return xn

    arrays = tuple(
        jax.device_put(jnp.asarray(a), shard)
        for a in (pos_np, rank_np, cnt_np, node_np)
    ) + (
        jax.device_put(jnp.asarray(inv_cnt_np), repl),
        jax.device_put(jnp.asarray(has_steps_np), repl),
    ) + (
        tuple(jax.device_put(jnp.asarray(a), shard) for a in grid["arrays"])
        if grid is not None else ()
    )

    def make_state(x0=None):
        x_node0 = np.asarray(
            x0 if x0 is not None else pidx.initial_positions(), dtype=dtype
        )
        xs0 = np.zeros((ndev, L), dtype=dtype)
        live = node_np >= 0
        xs0[live] = x_node0[node_np[live]]
        return (
            jax.device_put(jnp.asarray(xs0), shard),
            jax.device_put(jnp.asarray(x_node0), repl),
        )

    info = {"n_sweeps": n_sweeps, "updates_per_sweep": updates_per_sweep,
            "proposals": PP,
            "active_frac": active_frac, "n_offsets": K, "shard_len": L,
            "rotate": rotate, "consensus_every": consensus_every,
            "grid_consensus": grid is not None,
            "grid_coverage": grid["coverage"] if grid is not None else None}

    if expose_parts:
        n_phase = len(sweep_fns)
        n_rot = max(consensus_every // n_phase, 1)

        def _sweeps_body(xs, base, pos, rank_a, cnt_a):
            def rot_block(j, xs):
                for rr in range(n_phase):
                    idx = j * n_phase + rr
                    r = jnp.minimum(idx, n_sweeps - 1)
                    key = jax.random.fold_in(base, idx)
                    xs = sweep_fns[rr](
                        xs, key, etas_j[r], cool_j[r], pos, rank_a, cnt_a
                    )
                return xs
            return jax.lax.fori_loop(0, n_rot, rot_block, xs)

        def _mk(with_consensus):
            def device_period(xs, base_key, pos, rank_a, cnt_a, node_a,
                              inv_cnt_a, has_steps_a, *cons):
                xs, pos, rank_a, cnt_a, node_a = (
                    xs[0], pos[0], rank_a[0], cnt_a[0], node_a[0]
                )
                cons_l = tuple(c[0] for c in cons)
                dev = jax.lax.axis_index(axis)
                base = jax.random.fold_in(base_key, dev)
                xs = _sweeps_body(xs, base, pos, rank_a, cnt_a)
                if with_consensus:
                    w_a = (node_a >= 0).astype(xs.dtype)
                    xs, _ = consensus(xs, node_a, w_a, inv_cnt_a, *cons_l)
                return xs[None]

            return jax.jit(shard_map(
                device_period,
                mesh=mesh,
                in_specs=(P(axis), P(), P(axis), P(axis), P(axis),
                          P(axis), P(), P()) + cons_specs,
                out_specs=P(axis),
            ))

        info["parts"] = {"sweeps_fn": _mk(False), "period_fn": _mk(True)}

    return run, arrays, make_state, info


def path_linear_sgd_sweep_sharded(
    graph: Optional[BidirectedGraph],
    params: PathSGDParams,
    mesh=None,
    pidx: Optional[PathIndex] = None,
    **kw,
) -> Optional[np.ndarray]:
    import jax

    pidx = pidx or PathIndex.from_graph(graph)
    if pidx.num_nodes == 0:
        return np.zeros(0)
    if not pidx.has_multi_step_path():
        return None
    mesh = mesh or default_mesh()
    run, arrays, make_state, info = build_sharded_sweep(pidx, params, mesh, **kw)
    xs0, x_node0 = make_state()
    out = run(xs0, x_node0, jax.random.key(params.seed), *arrays)
    return np.asarray(jax.device_get(out), dtype=np.float64)


def path_sgd_sort_sweep_sharded(graph, params, mesh=None, **kw):
    from .. import handle as H

    pidx = PathIndex.from_graph(graph)
    x = path_linear_sgd_sweep_sharded(graph, params, mesh, pidx, **kw)
    if x is None or len(x) == 0:
        return []
    order = np.argsort(x, kind="stable")
    return [H.forward(int(pidx.node_ids[idx])) for idx in order]
