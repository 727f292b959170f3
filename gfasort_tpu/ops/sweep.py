"""Gather-free high-throughput 1D SGD: offset-pair sweeps in step space.

Motivation (measured on TPU v5e, see bench notes in the repo log): XLA
gathers/scatters with random indices cost ~15 ns per row regardless of
row width, so the gather-based batched engine tops out around ~10M
pair-updates/s/chip.  This engine removes per-update random access
entirely:

* **State lives in step space**: ``xs[s]`` is the position of *step*
  ``s`` (not node).  All per-update operands — partner position, path
  id, rank — are reads at a *fixed relative offset* ``s ± k``, which
  XLA implements as slice/concat (``roll``) fused into elementwise
  passes at full HBM bandwidth.  No gathers in the hot loop.
* **Quantized jump space**: each step samples its Zipf (or uniform)
  jump exactly, then snaps it to the nearest of a static, log-spaced
  offset set K (a few per octave up to ``space``).  The *term
  distance* used in the update is the true path distance of the snapped
  pair, so updates remain exact; only the jump-length distribution is
  coarsened — the same kind of approximation the reference itself
  applies beyond ``space_max`` via zeta quantization
  (src/sgd.rs:311-331).  Distribution quality is validated against the
  sequential oracle (tests + bench).
* **Periodic node consensus**: steps of one node drift independently
  within an epoch; every ``consensus_every`` sweeps, positions are
  averaged per node (one scatter-mean + one gather, the only random
  access, amortized over K·S updates).  This is bounded-staleness
  Hogwild — the reference's racy scheme has unbounded interleaving.

A sweep proposes one partner offset per step and applies the masked
update for every offset bucket in a fused pass; ~S valid pair-updates
per sweep.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

from ..graph import BidirectedGraph
from ..index import PathIndex
from ..params import PathSGDParams
from .fastpow import zeta_table
from .schedule import eta_schedule
from .sweep_common import (auto_sweep_config, fit_consensus_period,
                           pack_choices_words, phase_structure, sweep_rng)

__all__ = ["offset_set", "build_sweep_runner", "path_linear_sgd_sweep", "path_sgd_sort_sweep"]


def offset_set(space: int, per_octave: int = 4, dense_upto: int = 8) -> np.ndarray:
    """Static log-spaced jump offsets: all of 1..dense_upto, then
    ``per_octave`` per factor-2 up to ``space``."""
    ks = set(range(1, min(dense_upto, space) + 1))
    k = float(dense_upto)
    ratio = 2.0 ** (1.0 / per_octave)
    while k < space:
        k *= ratio
        ks.add(min(int(round(k)), space))
    return np.asarray(sorted(ks), dtype=np.int32)


@dataclass
class SweepResult:
    x: np.ndarray          # [N] final node positions
    sweeps: int
    updates_est: int


def select_consensus(step_node: np.ndarray, n_nodes: int, dtype,
                     path_of_step=None, rows: int = 1):
    """Pick the node-consensus implementation for a step->node map.

    The grid consensus (ops/grid_consensus.py, ~15 ms at S=4M) needs
    band locality — each tile of consecutive steps must reference a
    narrow node window on a uniform-stride grid.  Pangenome paths have
    it after any reasonable sort; adversarial or shuffled inputs do
    not.  Policy: build the grid plan (cheap, host-side), use it when
    coverage ≥ 0.97 and the window is economical; otherwise fall back
    to the gather-sum consensus (ops/node_sum.py, ~64 ms but
    locality-independent).  Override with GFASORT_CONSENSUS=
    {auto,grid,gather}.
    """
    from .node_sum import build_gather_consensus

    mode = os.environ.get("GFASORT_CONSENSUS", "auto")
    if mode != "gather" and np.dtype(dtype) == np.float32:
        # the grid dots accumulate in f32; f64 runs keep gather-sum
        from .grid_consensus import build_grid_consensus

        gx = build_grid_consensus(
            step_node, n_nodes, path_of_step=path_of_step, dtype=dtype,
            rows=rows,
        )
        good = (
            gx.fn is not None
            and gx.coverage >= 0.97
            and gx.window <= 4096
        )
        if mode == "grid" or good:
            return gx
        gc = build_gather_consensus(step_node, n_nodes, dtype)
        # report the measured (rejected) band coverage so bench/info
        # surfaces state WHY the fallback fired (ADVICE r4)
        gc.coverage = gx.coverage
        return gc
    return build_gather_consensus(step_node, n_nodes, dtype)


def build_sweep_runner(
    pidx: PathIndex,
    params: PathSGDParams,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
):
    """Construct the jitted sweep-engine runner once.  Returns
    (run_fn, arrays, make_state, info) where
    ``run_fn(xs, x_node_init, base_key, *arrays)`` executes the whole
    schedule on device.  Building once matters: re-tracing the K-offset
    body costs seconds of host time per call (it dwarfed device time in
    early benchmarks).

    Knobs left as None default to the shape-aware policy
    (:func:`gfasort_tpu.ops.sweep_common.auto_sweep_config`): large
    workloads get the certified throughput settings, small many-path
    loci keep conservative ones.

    Under the warm-process server (GFASORT_RUNNER_CACHE=1), the whole
    built runner is memoized by workload/params fingerprint — see
    ops/runner_cache.py."""
    from . import runner_cache

    if runner_cache.enabled():
        ck = ("sweep1d", runner_cache.fingerprint_pidx(pidx),
              runner_cache.params_key(params), runner_cache.env_key(),
              per_octave, consensus_every, active_frac, str(rotate),
              dense_upto, proposals)
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

    _auto = auto_sweep_config(S, N)
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

    # Jump lengths are RANKS, not bp: the reference clamps the jump to
    # the available rank range (src/sgd.rs:462, :477), so no jump can
    # exceed the longest path's step count even though ``space`` is in
    # bp (src/ygs.rs:79).
    max_jump = max(1, min(int(params.space), pidx.max_path_step_count - 1))
    offs = offset_set(max_jump, per_octave, dense_upto)
    K = len(offs)

    # Bucket rotation: a single sweep samples a rotate-x coarser
    # large-jump grid — the same approximation class as the snapping
    # itself, still with exact snapped-pair distances.  Updates per
    # sweep are unchanged (each active step still proposes exactly one
    # partner).  Shared resolution logic: sweep_common.phase_structure.
    n_dense = int((offs <= 8).sum())
    phase_offsets, rotate, consensus_every = phase_structure(
        offs, rotate, consensus_every
    )

    # ---- static device arrays (elementwise residents, no gathers) ----
    pos = jnp.asarray(pidx.step_pos, dtype=fdt)
    rank_arr = jnp.asarray(pidx.step_rank.astype(np.int32))
    cnt_arr = jnp.asarray(pidx.step_count_of_step.astype(np.int32))

    # Fused Pallas kernel for all small-offset buckets (k <= KMAX =
    # 8192): one HBM pass computes their halves (ops/sweep_dense.py);
    # the XLA loop then runs only the huge buckets.  Built per phase
    # below (mid-bucket indices are phase-specific).
    from .sweep_dense import (
        build_bucket_apply,
        dense_kernel_enabled,
        kernel_kmax,
    )

    use_dense = dense_kernel_enabled(dtype, S, n_dense)

    # Pair term-distances are STATIC (pos never changes): precompute
    # |pos[s] - pos[s±k]| per offset so the sweep halves read one [S]
    # array instead of pos + a materialized roll of pos (~25% of the
    # sweep's HBM traffic; rolls materialize on TPU).  Wrap lanes hold
    # garbage — they are masked by the iota guard.  Gated by memory:
    # 2·K·S·itemsize must fit comfortably in HBM next to everything
    # else.  Dense offsets are served by the kernel (which recomputes d
    # from pos in VMEM) and need no tables when it is on.
    dk_budget = int(os.environ.get("GFASORT_DK_BUDGET", 3 * 1024**3))
    itemsize = np.dtype(dtype).itemsize
    dk_offs = [kk for kk in offs.tolist()
               if not (use_dense and kk <= kernel_kmax())]
    use_dk = 2 * len(dk_offs) * S * itemsize <= dk_budget
    # Tables are computed ON DEVICE, INSIDE run_chunk, from the single
    # uploaded pos array (r3 measurements):
    #   * host-built tables were ~1 GB of host->device transfer, which
    #     at the tunnel's few-MB/s dominated the whole Y step;
    #   * a separate jitted builder program still paid the ~60-80 s
    #     FIXED remote-compile overhead that every distinct program
    #     costs on this backend (a 3-roll toy program compiled in 78 s;
    #     the local persistent cache never captures axon compiles).
    # Recomputing them per dispatch is ~5 ms of device time.
    #
    # They stay SEPARATE [S] values, NOT one stacked [n_dk, S] array:
    # static-index row reads of a stacked operand break elementwise
    # fusion on TPU (each row materializes), measured -30% on the
    # headline (609M vs 874M upd/s, scratch/headline_probe.py).
    off_slot = {int(kk): i for i, kk in enumerate(dk_offs)} if use_dk else {}

    def make_dks(p):
        if not use_dk:
            return ()
        outs = []
        for kk in dk_offs:
            outs.append(jnp.abs(p - jnp.roll(p, -kk)))
            outs.append(jnp.abs(p - jnp.roll(p, +kk)))
        return tuple(outs)

    # Active fraction: resolved up front by auto_sweep_config (capped
    # at ~4 active updates per node per sweep — full-width Jacobi
    # rounds oversmooth on many-path loci, see the policy docstring).
    # Multi-proposal sweeps (r5): each step draws P independent
    # proposals per sweep; the expensive per-bucket update math is
    # shared across proposals (only the mask compares scale with P),
    # so the engine applies ~P× the updates for ~(1+ε)× the op budget.
    updates_per_sweep = P * max(1, int(S * active_frac))

    # schedule: one iteration = ceil(mtu / updates_per_sweep) sweeps
    etas = eta_schedule(
        1.0 / params.eta_max, 1.0, params.iter_max,
        params.iter_with_max_learning_rate, params.eps,
    )
    spi = max(1, -(-params.min_term_updates // updates_per_sweep))
    sweep_eta = np.repeat(etas, spi)
    sweep_cool = np.repeat(np.arange(params.iter_max + 1) > params.first_cooling_iteration, spi)
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

    from .sweep_common import make_offset_sampler

    def make_sweep_fn(offs_p: np.ndarray):
        offs_p = np.asarray(offs_p)
        Kp = len(offs_p)
        _, _, sample_block = make_offset_sampler(offs_p, params, zetas, fdt)
        if use_dense:
            kmax = kernel_kmax()
            kbuckets = [(int(offs_p[ki]), ki) for ki in range(Kp)
                        if offs_p[ki] <= kmax]
            bucket_apply = build_bucket_apply(kbuckets, S, fdt, proposals=P)
            served = {ki for _, ki in kbuckets}
        else:
            bucket_apply = None
            served = set()

        def sweep(xs, key, eta, cooling, pos, rank_arr, cnt_arr, *dks):
            """One sweep: each step proposes P signed offset buckets;
            for every bucket, apply the masked pair update via rolls."""
            # P independent proposal streams.  P=1 keeps the r4 key
            # schedule exactly (no extra fold).
            if P == 1:
                bits, u = sweep_rng(key, S, fdt)
                sidxs = [sample_block(
                    bits, u, cooling, rank_arr, cnt_arr, active_frac)]
            else:
                bu = [sweep_rng(jax.random.fold_in(key, pi), S, fdt)
                      for pi in range(P)]
                # bit-identical to P sample_block calls, shares the
                # direction-constant chains (sweep_common.sample_blocks)
                sidxs = sample_block.multi(
                    bu, cooling, rank_arr, cnt_arr, active_frac)

            # IMPORTANT: every roll below applies to an INPUT array only.
            # Rolling a computed value (e.g. the update itself) breaks XLA
            # fusion and blows up both compile time and runtime; instead the
            # partner-side contribution is recomputed from the receiver's
            # perspective with inputs rolled the other way (measured ~100x
            # faster on TPU v5e).
            iota = jax.lax.iota(jnp.int32, S)
            if bucket_apply is not None:
                # all buckets with offset <= KMAX in one fused pass;
                # P > 1 proposals ride ceil(P/4) packed i32 operands
                sidx_k = (sidxs[0] if P == 1
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
                    """Contribution received at each element from the pair
                    (t, t+shift): dx = xs[t] - xs[t+shift].  ``pairs`` is
                    [(mine_p, theirs_p)] per proposal; the weight is the
                    COUNT of proposals selecting the pair.  Partner-in-path
                    validity needs NO rank/cnt reads: the sampler only
                    emits a choice whose snapped offset fits the available
                    rank range (sweep_common.sample_block), and paths are
                    contiguous in step space, so both my own choice and
                    the rolled partner's choice guarantee an in-path pair.
                    The only hazard left is the roll wraparound at the
                    array ends — an iota compare (generated on the fly,
                    zero HBM traffic)."""
                    xs_o = jnp.roll(xs, shift)
                    guard = iota < S + shift if shift < 0 else iota >= shift
                    w = None
                    for w_mine, w_theirs in pairs:
                        wb = (w_mine | (w_theirs & guard)).astype(xs.dtype)
                        w = wb if w is None else w + wb
                    if use_dk:
                        slot = off_slot[k] * 2 + (0 if shift < 0 else 1)
                        d = dks[0][slot] if len(dks) == 1 else dks[slot]
                    else:
                        d = jnp.abs(pos - jnp.roll(pos, shift))
                    valid = d != 0
                    w = jnp.where(valid, w, fdt(0.0))
                    safe = jnp.where(valid, d, 1.0)
                    mu = jnp.minimum(eta / safe, 1.0)
                    dx = xs - xs_o
                    dx = jnp.where(dx == 0, fdt(1e-9), dx)
                    mag = jnp.abs(dx)
                    # for pair (a=me, b=other): I am 'a', I receive
                    # -r_x; dx/|dx| = sign, so one divide per half
                    # (mirrors the fused kernel, ops/sweep_dense.py)
                    half_sgn = jnp.where(dx >= 0, fdt(0.5), fdt(-0.5))
                    r_x = mu * (mag - safe) * half_sgn
                    return -w * r_x, w

                # partner ahead of me (t+k): I chose +k, or they chose -k;
                # all mask logic derives from rolls of the i32 sidx arrays
                d1, w1 = half(-k, [(s == ki, jnp.roll(s, -k) == ~ki)
                                   for s in sidxs])
                # partner behind me (t-k): I chose -k, or they chose +k
                d2, w2 = half(+k, [(s == ~ki, jnp.roll(s, +k) == ki)
                                   for s in sidxs])
                dsum = dsum + d1 + d2
                csum = csum + w1 + w2
            return xs + dsum / jnp.maximum(csum, 1)

        return sweep

    sweep_fns = [make_sweep_fn(po_) for po_ in phase_offsets]

    gc = select_consensus(pidx.step_node_idx, N, dtype, pidx.step_path)
    n_cons = len(gc.arrays)

    # NOTE: the big static arrays are ARGUMENTS, not closures — XLA
    # constant-folds rolls of closed-over constants into the executable
    # (K rolled copies of each array => multi-GB programs), a baked [S]
    # constant makes every distinct graph ordering a fresh multi-minute
    # tunnel compile, and multi-MB-constant programs have crashed the
    # axon client.

    # Bounded-dispatch chunking: one XLA program running tens of
    # seconds has crashed the TPU worker (watchdog); the schedule is
    # split into dispatches of at most `chunk_periods` consensus
    # periods, with the absolute period index passed as a traced scalar
    # so every dispatch reuses ONE compiled program.  The final dispatch
    # overshoots to a full chunk with the sweep index clamped — the same
    # terminal-eta convention the period rounding already uses.
    n_periods = -(-n_sweeps // consensus_every)
    budget = int(os.environ.get("GFASORT_SWEEP_DISPATCH_ELEMS", 5e8))
    chunk_periods = max(1, min(n_periods, budget // max(S * consensus_every, 1)))
    n_dispatch = -(-n_periods // chunk_periods)

    # ONE jitted program for the whole engine (no separate dk builder,
    # no separate finish): every distinct program pays the backend's
    # ~60-80 s fixed remote-compile overhead, so run_chunk computes
    # the dk tables in-program, carries the consensus's node means,
    # and applies the stepless-node passthrough itself.
    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(xs, p0, base_key, x_node_init, pos, rank_a, cnt_a, *cons):
        # Nested loops, NOT lax.cond: a conditional inside the loop
        # forces per-iteration copies of every captured operand
        # (profiled at ~26 ms per s32[S]/pred[S] array per sweep);
        # running `consensus_every` sweeps per outer step and doing the
        # consensus unconditionally removes them.
        dks = make_dks(pos)

        if len(sweep_fns) == 1:
            def inner(rr, carry):
                p_idx, xs = carry
                r = jnp.minimum(p_idx * consensus_every + rr, n_sweeps - 1)
                key = jax.random.fold_in(base_key, p_idx * consensus_every + rr)
                xs = sweep_fns[0](xs, key, etas_j[r], cool_j[r], pos, rank_a, cnt_a, *dks)
                return (p_idx, xs)

            def outer(i, carry):
                xs, _ = carry
                p_idx = p0 + i
                _, xs = jax.lax.fori_loop(0, consensus_every, inner, (p_idx, xs))
                return gc.fn(xs, *cons)
        else:
            # bucket rotation: one ROTATION BLOCK (each phase once, in
            # order) is unrolled in Python so each sweep's offset set
            # stays static; the period then fori_loops over whole
            # blocks (consensus_every is a multiple of `rotate`, so the
            # phase of slot rr is rr % rotate in every period).  This
            # traces each phase body ONCE per program instead of once
            # per period slot — ce=48/rotate=8 used to trace 48 sweep
            # bodies; trace+lowering time was the #1 cost of every cold
            # start (VERDICT r2).
            n_phase = len(sweep_fns)
            n_rot = consensus_every // n_phase
            full_unroll = os.environ.get("GFASORT_ROT_UNROLL", "0") == "1"

            def outer(i, carry):
                xs, _ = carry
                p_idx = p0 + i

                def rot_block(j, xs):
                    for rr in range(n_phase):
                        idx = p_idx * consensus_every + j * n_phase + rr
                        r = jnp.minimum(idx, n_sweeps - 1)
                        key = jax.random.fold_in(base_key, idx)
                        xs = sweep_fns[rr](
                            xs, key, etas_j[r], cool_j[r], pos, rank_a,
                            cnt_a, *dks
                        )
                    return xs

                if full_unroll:
                    for j in range(n_rot):
                        xs = rot_block(jnp.int32(j), xs)
                elif n_rot == 1:
                    xs = rot_block(jnp.int32(0), xs)
                else:
                    xs = jax.lax.fori_loop(0, n_rot, rot_block, xs)
                return gc.fn(xs, *cons)

        # carry length: grid consensus emits [N] means, the gather
        # fallback emits [n_sorted] (live nodes only)
        xn_len = getattr(gc, "n_sorted", N)
        xs, xn = jax.lax.fori_loop(
            0, chunk_periods, outer, (xs, jnp.zeros(xn_len, xs.dtype))
        )
        # nodes with no path steps keep their initial positions
        # (reference: untouched x entries, src/sgd.rs:264-294); xn is
        # the LAST period's consensus means — applying a redundant
        # extra consensus (the old separate `finish` program) is a
        # no-op on the means (every step of a node already holds them)
        return xs, gc.to_node_order(xn, x_node_init, *cons)

    def run(xs, x_node_init, base_key, pos, rank_a, cnt_a, *rest):
        import jax.numpy as _jnp

        for d in range(n_dispatch):
            xs, xn = run_chunk(
                xs, _jnp.int32(d * chunk_periods), base_key,
                x_node_init, pos, rank_a, cnt_a, *rest,
            )
        return xn

    arrays = (pos, rank_arr, cnt_arr) + gc.arrays

    def make_state(x0=None):
        x_node0 = np.asarray(
            x0 if x0 is not None else pidx.initial_positions(), dtype=dtype
        )
        xs0 = jnp.asarray(x_node0[pidx.step_node_idx], dtype=fdt)
        return xs0, jnp.asarray(x_node0, dtype=fdt)

    _kmax_v = kernel_kmax() if use_dense else 0
    _kb = [sum(1 for k in po_.tolist() if k <= _kmax_v)
           for po_ in phase_offsets]
    info = {"n_sweeps": n_sweeps, "updates_per_sweep": updates_per_sweep,
            "proposals": P,
            "active_frac": active_frac, "n_offsets": K, "rotate": rotate,
            "phase_offsets": [len(po_) for po_ in phase_offsets],
            "consensus_every": consensus_every, "dense_kernel": use_dense,
            "per_octave": per_octave,
            # avg per-phase bucket split between the fused Pallas
            # kernel and the XLA roll passes (roofline accounting)
            "kernel_buckets_per_phase": float(np.mean(_kb)),
            "xla_buckets_per_phase": float(np.mean(
                [len(po_) - b for po_, b in zip(phase_offsets, _kb)])),
            "consensus": type(gc).__name__.replace("Consensus", "").lower(),
            "consensus_coverage": getattr(gc, "coverage", None)}
    if ck is not None:
        runner_cache.put(ck, (run, arrays, make_state, info))
    return run, arrays, make_state, info


def build_applied_counter(
    pidx: PathIndex,
    params: PathSGDParams,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
):
    """Exact APPLIED pair-update counter for a sweep schedule (VERDICT
    r3 weak #5: the bench numerator counts proposals, S·active_frac per
    sweep, but the engine deactivates some terms — snap overshoot
    beyond the available rank range, 1-step paths, zero term
    distances).

    Key property making this a standalone replay instead of an engine
    instrumentation: a proposed pair's VALIDITY never depends on the
    evolving positions ``xs`` — it is a function of the sampler draw
    (``sidx``, from the RNG key and the static rank/cnt arrays) and the
    static path-distance array ``pos`` only (`ops/sweep_common.py`
    sample_block; the d != 0 guard in the sweep halves uses pos-derived
    term distances).  So the count is computed by replaying the
    sampler with the engine's exact key schedule and counting valid
    choices — zero perturbation of the timed hot loop.

    Returns (count_fn, arrays, info); ``count_fn(base_key, *arrays)``
    -> ``{"applied": int, "proposed_actual": int}`` over the whole
    executed schedule (including the engine's period-padding overshoot
    sweeps, which do run and apply updates).  ``proposed_actual`` counts
    the sampler's ACTUAL activations (``sidx != INACTIVE``) in the same
    replay — the exact denominator ADVICE r4 asked for (the expected
    ``S*active_frac`` carries binomial noise at ``active_frac < 1``).
    """
    import jax
    import jax.numpy as jnp

    dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    fdt = {np.float32: jnp.float32, np.float64: jnp.float64}[dtype]
    S = pidx.total_steps
    N = pidx.num_nodes

    _auto = auto_sweep_config(S, N)
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

    max_jump = max(1, min(int(params.space), pidx.max_path_step_count - 1))
    offs = offset_set(max_jump, per_octave, dense_upto)
    phase_offsets, rotate, consensus_every = phase_structure(
        offs, rotate, consensus_every
    )

    updates_per_sweep = P * max(1, int(S * active_frac))
    spi = max(1, -(-params.min_term_updates // updates_per_sweep))
    n_sweeps = (params.iter_max + 1) * spi
    # must mirror the engine's period fit exactly (same key schedule)
    consensus_every = fit_consensus_period(
        n_sweeps, consensus_every, len(phase_offsets)
    )
    sweep_cool = np.repeat(
        np.arange(params.iter_max + 1) > params.first_cooling_iteration, spi
    )
    cool_j = jnp.asarray(sweep_cool)
    n_periods = -(-n_sweeps // consensus_every)
    total_exec = n_periods * consensus_every  # incl. period padding

    zetas = zeta_table(
        params.space, params.space_max, params.space_quantization_step,
        params.theta,
    )
    from .sweep_common import make_offset_sampler

    samplers = [
        make_offset_sampler(po_, params, zetas, fdt)[2]
        for po_ in phase_offsets
    ]
    n_phase = len(phase_offsets)
    n_blocks = total_exec // n_phase

    pos = jnp.asarray(pidx.step_pos, dtype=fdt)
    rank_arr = jnp.asarray(pidx.step_rank.astype(np.int32))
    cnt_arr = jnp.asarray(pidx.step_count_of_step.astype(np.int32))

    from .sweep_common import INACTIVE as _INACT

    # The on-device accumulators are i32 (x64 is disabled in this
    # stack) and wrap past 2**31-1 — ADVICE r4: the full CLI 4M-genome
    # schedule (~1.6e9) left only ~25% headroom.  Each block adds at
    # most n_phase*S to each counter, so the block loop is CHUNKED
    # host-side with exact Python-int summation; any schedule size is
    # now exact.
    chunk_blocks = max(1, (2**31 - 1) // max(n_phase * S * P, 1))

    @partial(jax.jit, static_argnames=("nb",))
    def count_chunk(b0, base_key, pos, rank_a, cnt_a, *, nb):
        def block(jl, acc):
            ap, pr = acc
            j = b0 + jl
            for rr in range(n_phase):
                idx = j * n_phase + rr
                r = jnp.minimum(idx, n_sweeps - 1)
                key = jax.random.fold_in(base_key, idx)
                offs_p = phase_offsets[rr]
                # mirrors the engine's per-proposal key schedule (and
                # its shared-chain multi sampler — bit-identical either
                # way, tests/test_sweep.py::test_sample_blocks_bit_identical)
                if P == 1:
                    bits, u = sweep_rng(key, S, fdt)
                    sidxs = [samplers[rr](
                        bits, u, cool_j[r], rank_a, cnt_a, active_frac)]
                else:
                    bu = [sweep_rng(jax.random.fold_in(key, pi), S, fdt)
                          for pi in range(P)]
                    sidxs = samplers[rr].multi(
                        bu, cool_j[r], rank_a, cnt_a, active_frac)
                for sidx in sidxs:
                    pr = pr + jnp.sum(sidx != _INACT, dtype=jnp.int32)
                    for ki in range(len(offs_p)):
                        k = int(offs_p[ki])
                        # A +k (resp. -k) choice at step t is guaranteed
                        # in-path by the sampler, so t+k < S (paths are
                        # contiguous); rolled-in wrap lanes can never be
                        # chosen and need no guard here.
                        d_f = jnp.abs(pos - jnp.roll(pos, -k))
                        d_b = jnp.abs(pos - jnp.roll(pos, +k))
                        ap = ap + jnp.sum(
                            (sidx == ki) & (d_f != 0), dtype=jnp.int32
                        )
                        ap = ap + jnp.sum(
                            (sidx == ~ki) & (d_b != 0), dtype=jnp.int32
                        )
            return ap, pr
        return jax.lax.fori_loop(
            0, nb, block, (jnp.int32(0), jnp.int32(0))
        )

    def count_fn(base_key, pos, rank_a, cnt_a):
        applied = proposed = 0
        b0 = 0
        while b0 < n_blocks:
            nb = min(chunk_blocks, n_blocks - b0)
            a, pr = count_chunk(
                jnp.int32(b0), base_key, pos, rank_a, cnt_a, nb=nb
            )
            applied += int(jax.device_get(a))
            proposed += int(jax.device_get(pr))
            b0 += nb
        return {"applied": applied, "proposed_actual": proposed}

    info = {
        "n_sweeps": n_sweeps,
        "total_exec_sweeps": total_exec,
        "updates_per_sweep": updates_per_sweep,
        "proposed": n_sweeps * updates_per_sweep,
        "active_frac": active_frac,
    }
    return count_fn, (pos, rank_arr, cnt_arr), info


def path_linear_sgd_sweep(
    graph: Optional[BidirectedGraph],
    params: PathSGDParams,
    pidx: Optional[PathIndex] = None,
    per_octave: Optional[int] = None,
    consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None,
    rotate=None,
    dense_upto: Optional[int] = None,
    proposals: Optional[int] = None,
    x0: Optional[np.ndarray] = None,
    return_info: bool = False,
):
    """1D path SGD via offset sweeps.  Same output contract as
    :func:`gfasort_tpu.ops.sgd.path_linear_sgd_batched`."""
    import jax

    pidx = pidx or PathIndex.from_graph(graph)
    if pidx.num_nodes == 0:
        return np.zeros(0)
    if not pidx.has_multi_step_path():
        return None
    run, arrays, make_state, info = build_sweep_runner(
        pidx, params, per_octave, consensus_every, active_frac, rotate,
        dense_upto, proposals,
    )
    xs0, x_node0 = make_state(x0)
    x_final = run(xs0, x_node0, jax.random.key(params.seed), *arrays)
    x = np.asarray(jax.device_get(x_final), dtype=np.float64)
    if return_info:
        return SweepResult(
            x=x, sweeps=info["n_sweeps"],
            updates_est=info["n_sweeps"] * info["updates_per_sweep"],
        )
    return x


def path_sgd_sort_sweep(graph: BidirectedGraph, params: PathSGDParams, **kw):
    pidx = PathIndex.from_graph(graph)
    x = path_linear_sgd_sweep(graph, params, pidx, **kw)
    if x is None or len(x) == 0:
        return []
    order = np.argsort(x, kind="stable")
    # vectorized H.forward(node_ids[order]): a Python per-node loop
    # cost ~2 s at 1M nodes (warm-server hot path)
    return (np.asarray(pidx.node_ids)[order] << 1).tolist()
