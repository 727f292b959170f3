"""Gather-free nD layout SGD: offset-pair sweeps in step space.

The nD twin of :mod:`gfasort_tpu.ops.sweep` for the `L` pipeline step
(reference semantics: gfasort ``src/sgd.rs:773-1188``).  State is the
per-step, per-end coordinate block ``cs[S, 2, D]`` (end 0 = '+', 1 =
'-'); each term randomly picks which end of each endpoint to move
(``:1060-1077``), distances are Euclidean over D dims, and node-end
coupling (all steps of a node share its two end coordinates) is
restored by periodic consensus over ``(node, end)`` keys.

Same hot-loop discipline as the 1D engine: partner operands at fixed
offsets via input rolls, local partner-in-path validity, no gathers in
the sweep body.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from ..graph import BidirectedGraph
from ..index import PathIndex
from ..io.layout_tsv import Layout
from ..params import LayoutSGDParams
from .fastpow import zeta_table
from .schedule import eta_schedule
from .sweep import offset_set
from .sweep_common import (auto_sweep_config, fit_consensus_period,
                           phase_structure)

__all__ = [
    "build_sweep_nd_runner",
    "make_nd_sweep_fn",
    "path_linear_sgd_layout_sweep",
]


def make_nd_sweep_fn(offs_p, S, D, params, zetas, fdt, active_frac,
                     dense_vma=None, proposals: int = 1):
    """Build one nD sweep function for a phase's offset set.  Shared by
    the single-device runner and the sharded engine
    (parallel/sweep_nd_shard.py), which calls it with the per-shard
    length L as ``S`` and ``dense_vma={axis}`` (shard_map varying-axes
    annotation for the fused dense kernel's outputs).

    ``proposals`` > 1 (r5): P independent partner choices per step per
    sweep share ONE bucket pass (see ops/sweep.py).  The per-step END
    coin stays shared across proposals — the update math (my_pos, my_c)
    must be common for the bucket pass to be shareable; this is the
    same one-end-per-step-per-sweep approximation the engine already
    makes vs the reference's per-term coin (src/sgd.rs:1060-1077),
    certified via the stress ratio."""
    import jax
    import jax.numpy as jnp

    from .sweep_common import make_offset_sampler, sweep_rng
    from .sweep_dense import (
        build_dense_apply_nd,
        dense_kernel_enabled,
        kernel_kmax,
    )

    offs_p = np.asarray(offs_p)
    Kp = len(offs_p)
    P = max(1, int(proposals))
    _, _, sample_block = make_offset_sampler(offs_p, params, zetas, fdt)

    # fused Pallas kernel for all small-offset buckets (k <= KMAX,
    # ops/sweep_dense.py); mid-bucket indices are phase-specific
    nd_dense = int((offs_p <= 8).sum())
    np_dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    if dense_kernel_enabled(np_dtype, S, nd_dense):
        kmax = kernel_kmax()
        kbuckets = [(int(offs_p[ki]), ki) for ki in range(Kp)
                    if offs_p[ki] <= kmax]
        dense_apply = build_dense_apply_nd(
            nd_dense, S, D, fdt, vma=dense_vma, buckets=kbuckets,
            proposals=P,
        )
        served = {ki for _, ki in kbuckets}
    else:
        dense_apply = None
        served = set()

    def sweep(cs, key, eta, cooling, pos, rank_a, cnt_a, rev_a, len_a):
        """cs: [2*D, S] per-step end coordinates, row ``e*D + d``
        holding end ``e``'s dim ``d``.  SoA layout: every operand is
        an [S] row, so the TPU's 128-wide lanes stay fully packed —
        the original [S, 2, D] layout put D (2-3) in the minor
        dimension and ran ~30x below elementwise peak."""
        if P == 1:
            bits0, u0 = sweep_rng(key, S, fdt)
            sidxs = [sample_block(
                bits0, u0, cooling, rank_a, cnt_a, active_frac)]
        else:
            bu = [sweep_rng(jax.random.fold_in(key, pi), S, fdt)
                  for pi in range(P)]
            bits0 = bu[0][0]
            # bit-identical to P sample_block calls, shares the
            # direction-constant chains (sweep_common.sample_blocks)
            sidxs = sample_block.multi(
                bu, cooling, rank_a, cnt_a, active_frac)
        other_end_self = ((bits0 >> 29) & 1) == 1   # end coin for me

        # per-term end choice for EACH endpoint: the reference flips a
        # coin per endpoint per term (rs:1060-1077).  Elementwise: my
        # end coin is other_end_self; my bp position adjusts by my node
        # length when I use my other end; end index = coin XOR rev.
        my_pos = jnp.where(other_end_self, pos + len_a, pos)
        lane0 = jnp.where(other_end_self, 1 - rev_a, rev_a) == 0
        # my coordinates at the chosen end, one [S] row per dim
        my_c = [
            jnp.where(lane0, cs[d], cs[D + d]) for d in range(D)
        ]
        # force ONE materialization of the per-sweep derived rows:
        # all of these are computed values rolled by every bucket
        # below; without the barrier XLA may fuse their computation
        # into each roll (see ops/sweep.py)
        *sidxs, my_pos = jax.lax.optimization_barrier(
            (*sidxs, my_pos)
        )
        my_c = list(jax.lax.optimization_barrier(tuple(my_c)))

        iota = jax.lax.iota(jnp.int32, S)
        if dense_apply is not None:
            from .sweep_common import pack_choices_words

            sidx_k = (sidxs[0] if P == 1
                      else pack_choices_words(sidxs))
            acc, wacc = dense_apply(my_pos, sidx_k, my_c, eta)
        else:
            acc = [jnp.zeros((S,), cs.dtype) for _ in range(D)]
            wacc = jnp.zeros((S,), cs.dtype)
        for ki in range(Kp):
            if ki in served:
                continue
            k = int(offs_p[ki])

            def half(shift, pairs):
                # in-path validity comes from the sampler's offset
                # clamp; only the roll wraparound needs guarding
                # (see ops/sweep.py)
                pos_o = jnp.roll(my_pos, shift)
                c_o = [jnp.roll(c, shift) for c in my_c]
                guard = iota < S + shift if shift < 0 else iota >= shift
                w = None
                for w_mine, w_theirs in pairs:
                    wb = (w_mine | (w_theirs & guard)).astype(cs.dtype)
                    w = wb if w is None else w + wb
                d_term = jnp.abs(my_pos - pos_o)
                valid = d_term != 0
                w = jnp.where(valid, w, fdt(0.0))
                safe = jnp.where(valid, d_term, 1.0)
                mu = jnp.minimum(eta / safe, 1.0)
                deltas = [a - b for a, b in zip(my_c, c_o)]
                mag_sq = sum(dd * dd for dd in deltas)
                zero = mag_sq == 0
                deltas[0] = jnp.where(zero, fdt(1e-9), deltas[0])
                mag_sq = jnp.where(zero, fdt(1e-18), mag_sq)
                # rsqrt instead of sqrt + divide (ops/sweep_dense.py)
                inv = jax.lax.rsqrt(mag_sq)
                mag = mag_sq * inv
                r = jnp.minimum(mu * (mag - safe) * 0.5 * inv, 1e30)
                wr = w * r
                return [-wr * dd for dd in deltas], w   # I receive -upd

            d1, w1 = half(-k, [(s == ki, jnp.roll(s, -k) == ~ki)
                               for s in sidxs])
            d2, w2 = half(+k, [(s == ~ki, jnp.roll(s, +k) == ki)
                               for s in sidxs])
            acc = [a + x + y for a, x, y in zip(acc, d1, d2)]
            wacc = wacc + w1 + w2
        # the chosen end is fixed for the whole sweep: apply the mean
        # update to that lane once (select, no scatter)
        wmax = jnp.maximum(wacc, 1)
        rows = []
        for d in range(D):
            upd = acc[d] / wmax
            rows.append(cs[d] + jnp.where(lane0, upd, 0))
        for d in range(D):
            upd = acc[d] / wmax
            rows.append(cs[D + d] + jnp.where(lane0, 0, upd))
        return jnp.stack(rows, axis=0)

    return sweep


def build_sweep_nd_runner(
    pidx: PathIndex,
    params: LayoutSGDParams,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
):
    """Knobs left as None default to the shape-aware policy
    (:func:`gfasort_tpu.ops.sweep_common.auto_sweep_config` with
    ``layout=True``).  Under the warm-process server the built runner
    is memoized (ops/runner_cache.py)."""
    from . import runner_cache

    if runner_cache.enabled():
        ck = ("sweepnd", runner_cache.fingerprint_pidx(pidx),
              runner_cache.params_key(params), runner_cache.env_key(),
              int(params.dimensions), per_octave, consensus_every,
              active_frac, str(rotate), dense_upto, proposals)
        hit = runner_cache.get(ck)
        if hit is not None:
            return hit
    else:
        ck = None

    import jax
    import jax.numpy as jnp

    dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    fdt = {np.float32: jnp.float32, np.float64: jnp.float64}[dtype]
    S = pidx.total_steps
    N = pidx.num_nodes
    D = int(params.dimensions)

    _auto = auto_sweep_config(S, N, layout=True)
    if per_octave is None:
        per_octave = _auto["per_octave"]
    if consensus_every is None:
        consensus_every = _auto["consensus_every"]
    if active_frac is None:
        active_frac = _auto["active_frac"]
    if rotate is None:
        rotate = _auto["rotate"]
    if dense_upto is None:
        dense_upto = _auto.get("dense_upto", 8)
    if proposals is None:
        proposals = _auto.get("proposals", 1)
    P = max(1, int(proposals))
    # scoped-VMEM clamp: the fused kernel fits 1 + ceil(P/4) + D input
    # windows; 6 windows blow the Mosaic stack (measured: 1D P=16,
    # nD D=3 P=8 class).  Cap the word count so windows <= 5.
    max_words = max(1, 4 - D)
    if P > 4 * max_words:
        P = 4 * max_words

    # layout jumps are rank-limited like 1D (space is already in steps
    # for the layout params, src/sgd.rs:754)
    max_jump = max(1, min(int(params.space), pidx.max_path_step_count - 1))
    offs = offset_set(max_jump, per_octave, dense_upto)
    K = len(offs)

    # bucket rotation (see ops/sweep.py and sweep_common.phase_structure)
    phase_offsets, rotate, consensus_every = phase_structure(
        offs, rotate, consensus_every
    )

    pos = jnp.asarray(pidx.step_pos, dtype=fdt)
    rank_arr = jnp.asarray(pidx.step_rank.astype(np.int32))
    cnt_arr = jnp.asarray(pidx.step_count_of_step.astype(np.int32))
    node_arr = jnp.asarray(pidx.step_node_idx.astype(np.int32))
    rev_arr = jnp.asarray((pidx.step_handle & 1).astype(np.int32))
    len_arr = jnp.asarray(pidx.node_len, dtype=np.float32)[
        jnp.asarray(pidx.step_node_idx.astype(np.int32))
    ].astype(fdt)  # node length per step (resident, no gather in loop)

    # active_frac resolved up front by auto_sweep_config(layout=True):
    # frac floor 1/4 + rotate=8 + ce=8 reaches oracle-grade stress on
    # DRB1 (0.278 vs 0.274; the old 1/16 floor gave 0.31); large shapes
    # get the certified frac=min(4N/S, 1) (stress ratio 0.879 at the
    # chromosome cert shape, BEATS the oracle)
    updates_per_sweep = P * max(1, int(S * active_frac))

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
        make_nd_sweep_fn(po_, S, D, params, zetas, fdt, active_frac,
                         proposals=P)
        for po_ in phase_offsets
    ]

    # per-(node, end) counts are static (the step->node map never
    # changes): hoist them to a host-precomputed inverse
    cnt_node = np.bincount(pidx.step_node_idx, minlength=N)
    inv_cnt = jnp.asarray((1.0 / np.maximum(cnt_node, 1)).astype(dtype))

    # Node consensus over the 2D rows.  The grid consensus
    # (ops/grid_consensus.py) shares one factorized one-hot across all
    # rows, replacing 2D scatter-adds + 2D gathers per call; the
    # scatter fallback keeps working for poor-locality inputs (see
    # ops/sweep.select_consensus for the policy).
    from .sweep import select_consensus
    from .grid_consensus import GridConsensus

    gcx = select_consensus(pidx.step_node_idx, N, dtype, pidx.step_path,
                           rows=2 * D)
    use_grid = isinstance(gcx, GridConsensus)

    if use_grid:
        cons_arrays = gcx.arrays

        OFF = gcx.node_offset

        def consensus(cs, node_a, *cons):
            """Mean per (node, end, dim); cs rows are PHYSICAL-end
            coordinate rows, so the key is just the node."""
            lidx_a, anchors_a, oob_s, oob_n, inv_cnt_a = cons[:5]
            ssum = gcx.fwd(cs, lidx_a, anchors_a, oob_s, oob_n)
            x_node = (ssum[:, OFF : OFF + N] * inv_cnt_a[None, :]).astype(
                cs.dtype
            )
            cs_new = gcx.bwd(x_node, cs, lidx_a, anchors_a, oob_s, oob_n)
            return cs_new, x_node
    else:
        cons_arrays = ()

        def consensus(cs, node_a, *cons):
            """Scatter fallback: one [S]-row scatter-add per (end, dim)
            row + one [S]-row gather back."""
            rows_sum = [
                jnp.zeros((N,), cs.dtype).at[node_a].add(cs[r])
                for r in range(2 * D)
            ]
            x_node = jnp.stack([rs * inv_cnt for rs in rows_sum], axis=0)
            cs_new = jnp.stack([x_node[r][node_a] for r in range(2 * D)], axis=0)
            return cs_new, x_node

    # Bounded-dispatch chunking (see ops/sweep.py): one long-running
    # XLA program has crashed the TPU worker; the schedule splits into
    # dispatches of at most `chunk_periods` periods, absolute period
    # index as a traced scalar so all dispatches share one program.
    # nD sweeps stream ~2x the 1D bytes, so the element budget halves.
    import os as _os

    n_periods = -(-n_sweeps // consensus_every)
    budget = int(_os.environ.get("GFASORT_SWEEP_DISPATCH_ELEMS", 5e8)) // 2
    chunk_periods = max(1, min(n_periods, budget // max(S * consensus_every, 1)))
    n_dispatch = -(-n_periods // chunk_periods)

    has_steps_j = jnp.asarray(cnt_node > 0)

    # ONE jitted program (no separate finish — every distinct program
    # pays the backend's ~60-80 s fixed remote-compile overhead, see
    # ops/sweep.py): the chunk carries the consensus's node-end means
    # and applies the stepless-node passthrough itself.
    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(cs, p0, key, cs_node_init, pos, rank_a, cnt_a, rev_a,
                  len_a, node_a, *cons):
        # nested loops, not lax.cond (see ops/sweep_common.py rules)
        if len(sweep_fns) == 1:
            def inner(rr, carry):
                p_idx, cs = carry
                r = jnp.minimum(p_idx * consensus_every + rr, n_sweeps - 1)
                kk = jax.random.fold_in(key, p_idx * consensus_every + rr)
                cs = sweep_fns[0](cs, kk, etas_j[r], cool_j[r], pos, rank_a,
                                  cnt_a, rev_a, len_a)
                return (p_idx, cs)

            def outer(i, carry):
                cs, _ = carry
                p_idx = p0 + i
                _, cs = jax.lax.fori_loop(0, consensus_every, inner, (p_idx, cs))
                return consensus(cs, node_a, *cons)
        else:
            # rotation: Python-unroll ONE rotation block (each phase
            # once), fori_loop over blocks — traces each phase body
            # once per program, not once per period slot (see
            # ops/sweep.py)
            n_phase = len(sweep_fns)
            n_rot = consensus_every // n_phase

            def outer(i, carry):
                cs, _ = carry
                p_idx = p0 + i

                def rot_block(j, cs):
                    for rr in range(n_phase):
                        idx = p_idx * consensus_every + j * n_phase + rr
                        r = jnp.minimum(idx, n_sweeps - 1)
                        kk = jax.random.fold_in(key, idx)
                        cs = sweep_fns[rr](
                            cs, kk, etas_j[r], cool_j[r], pos, rank_a,
                            cnt_a, rev_a, len_a
                        )
                    return cs

                cs = (rot_block(jnp.int32(0), cs) if n_rot == 1
                      else jax.lax.fori_loop(0, n_rot, rot_block, cs))
                return consensus(cs, node_a, *cons)

        cs, xn = jax.lax.fori_loop(
            0, chunk_periods, outer, (cs, jnp.zeros_like(cs_node_init))
        )
        # nodes with no path steps keep their initial coordinates
        # (reference: untouched entries, src/sgd.rs:828-854)
        return cs, jnp.where(has_steps_j[None, :], xn, cs_node_init)

    def run(cs, cs_node_init, key, pos, rank_a, cnt_a, rev_a, len_a,
            node_a, *cons):
        for d in range(n_dispatch):
            cs, xn = run_chunk(
                cs, jnp.int32(d * chunk_periods), key, cs_node_init,
                pos, rank_a, cnt_a, rev_a, len_a, node_a, *cons,
            )
        return xn

    arrays = (pos, rank_arr, cnt_arr, rev_arr, len_arr, node_arr) + cons_arrays

    def make_state(init_node_coords: np.ndarray):
        """init_node_coords: [2N, D] (node-end rows) -> ([2D, S] SoA
        step state, [2D, N] node-order init for stepless passthrough)."""
        nc = np.asarray(init_node_coords, dtype=dtype).reshape(N, 2, D)
        per_step = nc[pidx.step_node_idx]          # [S, 2, D]
        cs0 = jnp.asarray(
            np.ascontiguousarray(per_step.transpose(1, 2, 0).reshape(2 * D, -1)),
            dtype=fdt,
        )
        cs_node0 = jnp.asarray(
            np.ascontiguousarray(nc.transpose(1, 2, 0).reshape(2 * D, N)),
            dtype=fdt,
        )
        return cs0, cs_node0

    info = {
        "n_sweeps": n_sweeps,
        "updates_per_sweep": updates_per_sweep,
        "proposals": P,
        "active_frac": active_frac,
        "n_offsets": K,
        "rotate": rotate,
        "consensus_every": consensus_every,
    }
    if ck is not None:
        runner_cache.put(ck, (run, arrays, make_state, info))
    return run, arrays, make_state, info


def path_linear_sgd_layout_sweep(
    graph: Optional[BidirectedGraph],
    params: LayoutSGDParams,
    pidx: Optional[PathIndex] = None,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
    init_coords: Optional[np.ndarray] = None,
) -> Layout:
    import jax

    pidx = pidx or PathIndex.from_graph(graph)
    n = pidx.num_nodes
    dims = params.dimensions
    if n == 0:
        return Layout(dims, 0)
    if not pidx.has_multi_step_path():
        return Layout(dims, n)

    if init_coords is None:
        from .exact import layout_initial_coords

        init_coords = layout_initial_coords(pidx, dims, params.seed)

    run, arrays, make_state, info = build_sweep_nd_runner(
        pidx, params, per_octave, consensus_every, active_frac, rotate,
        dense_upto, proposals,
    )
    cs0, cs_node0 = make_state(init_coords)
    x_node = run(cs0, cs_node0, jax.random.key(params.seed), *arrays)
    # [2D, N] SoA rows -> [2N, D] node-end-major state
    xn = np.asarray(jax.device_get(x_node), dtype=np.float64)
    state = np.ascontiguousarray(
        xn.reshape(2, dims, n).transpose(2, 0, 1).reshape(2 * n, dims)
    )
    return Layout.from_state(state)
