"""Benchmark utilities: synthetic pangenome workloads and timed runs.

The reference publishes no benchmark numbers (BASELINE.md), so the
measured baseline is our own C++ sequential oracle — a faithful
reimplementation of the reference's single-thread inner loop — and the
headline metric is SGD pair-updates/s/chip on the batched TPU engine.
"""

from __future__ import annotations

import time
from dataclasses import replace
from typing import Optional

import numpy as np

from .index import PathIndex
from .params import PathSGDParams

__all__ = ["synthetic_path_index", "bench_batched_1d", "bench_native_1d"]


def synthetic_path_index(
    n_nodes: int = 100_000,
    n_paths: int = 16,
    steps_per_path: int = 100_000,
    seed: int = 0,
) -> PathIndex:
    """Build a chromosome-scale synthetic PathIndex directly (no
    host-graph construction): each path is a noisy monotone walk over
    the node space — the structure of a real pangenome path after a
    reasonable sort — with random node lengths 1..16 bp."""
    rng = np.random.default_rng(seed)
    node_len = rng.integers(1, 17, size=n_nodes).astype(np.int64)

    handles, poss, pths, rnks = [], [], [], []
    counts, lens = [], []
    for p in range(n_paths):
        # monotone-ish walk with local jitter and occasional reversals
        base = np.sort(rng.integers(0, n_nodes, size=steps_per_path))
        jitter = rng.integers(-50, 51, size=steps_per_path)
        nodes = np.clip(base + jitter, 0, n_nodes - 1)
        rev = rng.random(steps_per_path) < 0.05
        handles.append(((nodes + 1) << 1) | rev.astype(np.int64))
        lengths = node_len[nodes]
        pos = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        poss.append(pos)
        pths.append(np.full(steps_per_path, p, dtype=np.int32))
        rnks.append(np.arange(steps_per_path, dtype=np.int64))
        counts.append(steps_per_path)
        lens.append(int(lengths.sum()))

    step_handle = np.concatenate(handles)
    path_count = np.asarray(counts, dtype=np.int64)
    path_first = np.concatenate([[0], np.cumsum(path_count)[:-1]]).astype(np.int64)
    node_ids = np.arange(1, n_nodes + 1, dtype=np.int64)
    step_node_idx = (step_handle >> 1) - 1

    return PathIndex(
        step_handle=step_handle,
        step_pos=np.concatenate(poss),
        step_path=np.concatenate(pths),
        step_rank=np.concatenate(rnks),
        path_first=path_first,
        path_count=path_count,
        path_len=np.asarray(lens, dtype=np.int64),
        node_ids=node_ids,
        node_len=node_len,
        handle_to_idx={int(n): i for i, n in enumerate(node_ids)},
        step_node_idx=step_node_idx,
        step_count_of_step=path_count[np.concatenate(pths)],
    )


def shuffled_path_index(
    n_nodes: int = 1_000_000,
    n_paths: int = 16,
    steps_per_path: int = 250_000,
    seed: int = 0,
) -> PathIndex:
    """Adversarial-locality variant of :func:`synthetic_path_index`:
    node identities are randomly permuted, so consecutive steps
    reference scattered node ids and the grid consensus's band-locality
    assumption fails (coverage collapses; ops/sweep.select_consensus
    then auto-falls back to the gather-sum consensus).  Path structure,
    distances and ranks are unchanged — only the step->node map is
    scrambled."""
    pidx = synthetic_path_index(n_nodes, n_paths, steps_per_path, seed=seed)
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(n_nodes)  # new node index of old index i
    new_node_idx = perm[pidx.step_node_idx]
    new_node_len = np.empty_like(pidx.node_len)
    new_node_len[perm] = pidx.node_len
    new_handle = ((new_node_idx + 1) << 1) | (pidx.step_handle & 1)
    return PathIndex(
        step_handle=new_handle,
        step_pos=pidx.step_pos,
        step_path=pidx.step_path,
        step_rank=pidx.step_rank,
        path_first=pidx.path_first,
        path_count=pidx.path_count,
        path_len=pidx.path_len,
        node_ids=pidx.node_ids,
        node_len=new_node_len,
        handle_to_idx={int(n): i for i, n in enumerate(pidx.node_ids)},
        step_node_idx=new_node_idx,
        step_count_of_step=pidx.step_count_of_step,
    )


def bench_params(pidx: PathIndex, batch: int, rounds: int) -> PathSGDParams:
    """Params that make the production engine run exactly ``rounds``
    rounds of width ``batch`` (iter_max = rounds-1, mtu = batch)."""
    p = PathSGDParams().derive_from_graph(pidx)
    return replace(
        p,
        iter_max=rounds - 1,
        min_term_updates=batch,
        batch=batch,
        dtype="float32",
        pow_mode="fast",
    )


def bench_batched_1d(
    pidx: PathIndex, batch: int = 262_144, rounds: int = 50,
    repeats: int = 3,
) -> dict:
    """Time the production batched engine end-to-end (device-resident
    loop; host touched once per run).  Returns rates in updates/s."""
    import jax

    from .ops.sgd import build_1d_runner

    params = bench_params(pidx, batch, rounds)
    run, make_x0, _n = build_1d_runner(pidx, params)
    key = jax.random.key(params.seed)
    # warm-up / compile (readback forces execution; block_until_ready
    # does not reliably block on the axon tunnel backend)
    np.asarray(jax.device_get(run(make_x0(), key)))
    best = float("inf")
    for _ in range(repeats):
        x0 = make_x0()
        _ = np.asarray(x0[:1])
        t0 = time.perf_counter()
        x = np.asarray(jax.device_get(run(x0, key)))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    total_updates = batch * rounds
    return {
        "seconds": best,
        "updates": total_updates,
        "updates_per_s": total_updates / best,
        "final_finite": bool(np.isfinite(x).all()),
        "batch": batch,
        "rounds": rounds,
    }


def bench_sweep_1d(
    pidx: PathIndex, rounds: int = 50, repeats: int = 3,
    per_octave: Optional[int] = None, consensus_every: Optional[int] = None,
    active_frac: Optional[float] = None, rotate=None,
    dense_upto: Optional[int] = None, proposals: Optional[int] = None,
) -> dict:
    """Time the gather-free offset-sweep engine (throughput mode).

    Timing protocol: the runner is built (and jitted) ONCE; each timed
    run ends with an explicit device_get readback — on the axon tunnel
    backend, ``block_until_ready`` does not reliably block, so only the
    readback bounds real execution."""
    import jax

    from .ops.sweep import build_sweep_runner

    # schedule: `rounds` sweeps of one iteration each
    from .ops.sweep_common import auto_sweep_config

    p = bench_params(pidx, 1, 1)
    S = pidx.total_steps
    N = pidx.num_nodes
    frac = (active_frac if active_frac is not None
            else auto_sweep_config(S, N)["active_frac"])
    ups = max(1, int(S * frac))
    p = replace(p, iter_max=rounds - 1, min_term_updates=ups)

    run, arrays, make_state, info = build_sweep_runner(
        pidx, p, per_octave=per_octave, consensus_every=consensus_every,
        active_frac=frac, rotate=rotate, dense_upto=dense_upto,
        proposals=proposals,
    )
    key = jax.random.key(p.seed)

    def once():
        xs0, xn0 = make_state()
        _ = np.asarray(xn0[:1])  # sync inputs
        t0 = time.perf_counter()
        out = run(xs0, xn0, key, *arrays)
        # A tiny dependent slice forces the whole program to finish on
        # device while transferring only a few bytes — the full-array
        # readback costs ~100+ ms of tunnel transfer that is not chip
        # time (block_until_ready does not reliably block on axon).
        _ = np.asarray(jax.device_get(out[:64]))
        dt = time.perf_counter() - t0
        return dt, np.asarray(jax.device_get(out))

    t0 = time.perf_counter()
    once()  # warm-up/compile
    warmup = time.perf_counter() - t0
    best, x = min((once() for _ in range(repeats)), key=lambda t: t[0])
    updates = info["n_sweeps"] * info["updates_per_sweep"]
    return {
        "seconds": best,
        "updates": updates,
        "updates_per_s": updates / best,
        "sweeps": info["n_sweeps"],
        "final_finite": bool(np.isfinite(x).all()),
        "active_frac": frac,
        # EFFECTIVE knobs after the runner's adjustments (rotate='auto'
        # resolution; ce rounded up to a multiple of rotate) — ADVICE
        # r3: certified and production configs must state these
        "consensus_every_eff": info["consensus_every"],
        "rotate_eff": info["rotate"],
        "proposals": info.get("proposals", 1),
        "consensus": info.get("consensus"),
        "consensus_coverage": (round(info["consensus_coverage"], 4)
                               if info.get("consensus_coverage") is not None
                               else None),
        "kernel_buckets_per_phase": info.get("kernel_buckets_per_phase"),
        "xla_buckets_per_phase": info.get("xla_buckets_per_phase"),
        # warm-up wall = trace + (tunnel) compile + one run; steady-state
        # `seconds` is pure device+dispatch time.  A warm persistent
        # cache shows here as warmup_s ~~ seconds + trace time.
        "warmup_s": warmup,
    }


# --- TPU v5e peak assumptions for the roofline (public chip specs; the
# VPU figure is derived, not published: (8, 128) vector lanes x 4 ALUs
# x ~0.94 GHz clock ~= 3.85e12 f32 elementwise ops/s.  Multi-pass ops
# (divide ~7, exp/log ~10) are counted at their pass cost in the op
# model below; see docs/DESIGN.md "Roofline" for the derivation.)
V5E_HBM_BYTES_S = 819e9
V5E_VPU_OPS_S = 3.85e12


def roofline_model(rate: float, info: dict, applied_frac: float,
                   consensus_ms: float = 12.5) -> dict:
    """HBM-bytes and VPU-ops accounting for the 1D sweep engine at a
    measured ``rate`` (pair-proposals/s/chip) — VERDICT r3 task 2.

    Per-element-per-sweep models (active_frac=1, fused kernel on,
    P = proposals per sweep; itemized in docs/DESIGN.md with the
    op-count table):

    HBM bytes:
      * sampler pass: read rank+cnt (8), write P sidx (4P)      = 8 + 4P
      * fused kernel: read xs/pos (8) + P sidx (4P),
        write dsum/csum (8)                                     = 16 + 4P
      * XLA huge buckets (one fused pass): re-read xs + P sidx
        at 2 roll alignments (8 + 8P), dk tables 8 per bucket,
        dsum/csum read+write (16)                               = 24 + 8P + 8·n_xla
      * combine: read xs/dsum/csum, write xs                    = 16
    VPU ops (f32 pass counts):
      * sampler (r5.2 shared-chain form, sweep_common.sample_blocks):
        per-direction constant chains computed once (2 × (snap
        where-tree ~12 + zeta/eta const trees ~2·13))          ~= 76
        per proposal: murmur hash RNG ~25, coins/masks ~17,
        direction selects 4, zipf math ~17, value-tracked snap
        (3 selects/tree node) ~39, stoch snap ~8, uniform ~4   ~= 114·P
      * fused kernel: shared update math ~62 + mask
        compares ~8·P per bucket                               ~= (62+8P)·n_kern
      * XLA bucket: shared ~42 (d read, not recomputed) + 8·P  ~= (42+8P)·n_xla
      * combine (div + add)                                     ~= 10

    The consensus is accounted as measured amortized TIME (it is
    neither BW- nor VPU-saturated; its cost structure is dots +
    per-segment dynamic slices, scratch/gc_parts_probe.py).
    """
    n_kern = float(info.get("kernel_buckets_per_phase") or 0.0)
    n_xla = float(info.get("xla_buckets_per_phase") or 0.0)
    ce = max(int(info.get("consensus_every_eff")
                 or info.get("consensus_every") or 1), 1)
    frac = float(info.get("active_frac") or 1.0)
    P = max(int(info.get("proposals") or 1), 1)

    bytes_pe = ((8 + 4 * P) + (16 + 4 * P)
                + (24 + 8 * P + 8 * n_xla if n_xla else 0) + 16)
    ops_pe = (76 + 114 * P if P > 1 else 155) \
        + (62 + 8 * P) * n_kern + (42 + 8 * P) * n_xla + 10
    # rate counts proposals = P·S·frac/sweep; per-element costs are
    # density-independent (masked SIMD), so per-UPDATE cost = per-elem
    # cost / (frac·P)
    bytes_pu = bytes_pe / max(frac * P, 1e-9)
    ops_pu = ops_pe / max(frac * P, 1e-9)

    bw_frac = bytes_pu * rate / V5E_HBM_BYTES_S
    vpu_frac = ops_pu * rate / V5E_VPU_OPS_S
    # amortized consensus time as a fraction of the per-sweep budget
    ups = float(info.get("updates_per_sweep")
                or (info["updates"] / max(info.get("sweeps", 1), 1)
                    if "updates" in info else 1.0))
    t_sweep_s = ups / max(rate, 1.0)
    cons_frac = (consensus_ms * 1e-3 / ce) / max(t_sweep_s, 1e-12)
    binding = "vpu" if vpu_frac >= bw_frac else "hbm"
    ceiling = (V5E_VPU_OPS_S / ops_pu if binding == "vpu"
               else V5E_HBM_BYTES_S / bytes_pu)
    return {
        "bytes_per_update": round(bytes_pu, 1),
        "vpu_ops_per_update": round(ops_pu, 1),
        "achieved_bw_frac": round(bw_frac, 4),
        "vpu_frac": round(vpu_frac, 4),
        "consensus_time_frac": round(cons_frac, 4),
        "applied_updates_frac": round(applied_frac, 4),
        "binding": binding,
        "implied_ceiling_updates_per_s": round(ceiling, 1),
        "model": "docs/DESIGN.md#roofline",
    }


def measure_applied_frac(
    pidx: PathIndex, rounds: int = 24, **cfg
) -> dict:
    """Fraction of proposed pair updates the engine actually APPLIES
    under the given config (VERDICT r3 weak #5) — replayed exactly via
    :func:`gfasort_tpu.ops.sweep.build_applied_counter` with the
    engine's key schedule, no hot-loop instrumentation."""
    import jax

    from .ops.sweep import build_applied_counter
    from .ops.sweep_common import auto_sweep_config

    p = bench_params(pidx, 1, 1)
    S, N = pidx.total_steps, pidx.num_nodes
    frac = cfg.get("active_frac")
    if frac is None:
        frac = auto_sweep_config(S, N)["active_frac"]
        cfg = dict(cfg, active_frac=frac)
    ups = max(1, int(S * frac))
    p = replace(p, iter_max=rounds - 1, min_term_updates=ups)
    count_fn, arrays, info = build_applied_counter(pidx, p, **cfg)
    res = count_fn(jax.random.key(p.seed), *arrays)
    applied, proposed = res["applied"], res["proposed_actual"]
    # scheduled denominator = EXECUTED proposals at the expected
    # S*active_frac per sweep (incl. the engine's period-padding
    # sweeps, which also run and apply updates); proposed is the EXACT
    # activation count from the same replay (ADVICE r4: the expected
    # value carries O(1/sqrt(S*frac)) binomial noise at frac < 1)
    executed = info["total_exec_sweeps"] * info["updates_per_sweep"]
    return {
        "applied": applied,
        "proposed_actual": proposed,
        "proposed_scheduled": executed,
        # exact: applied / actual activations, noise-free
        "applied_frac": applied / max(proposed, 1),
        # the headline discount: applied / the bench numerator's
        # scheduled proposal count
        "applied_vs_scheduled": applied / max(executed, 1),
        "total_exec_sweeps": info["total_exec_sweeps"],
        "n_sweeps": info["n_sweeps"],
    }


def bench_native_1d(pidx: PathIndex, n_updates: int = 2_000_000,
                    repeats: int = 3) -> Optional[dict]:
    """CPU baseline: the C++ sequential oracle inner loop (stands in
    for the Rust reference at -t 1; same per-update semantics).  Best
    of ``repeats`` passes: single-pass rates vary ~2x on the shared
    2-core host, which made vs_baseline noisy across bench runs."""
    from .native import available, load, _p64, _pf64
    from .ops.fastpow import zeta_table

    if not available():
        return None
    lib = load()
    params = bench_params(pidx, 1, 1)
    sp = np.ascontiguousarray(pidx.step_path, dtype=np.int64)
    sr = np.ascontiguousarray(pidx.step_rank, dtype=np.int64)
    spos = np.ascontiguousarray(pidx.step_pos, dtype=np.int64)
    snode = np.ascontiguousarray(pidx.step_node_idx, dtype=np.int64)
    pf = np.ascontiguousarray(pidx.path_first, dtype=np.int64)
    pc = np.ascontiguousarray(pidx.path_count, dtype=np.int64)
    x = pidx.initial_positions().copy()
    zetas = zeta_table(
        params.space, params.space_max, params.space_quantization_step,
        params.theta,
    )
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        lib.sgd1d_bench(
            pidx.total_steps, _p64(sp), _p64(sr), _p64(spos), _p64(snode),
            _p64(pf), _p64(pc),
            _pf64(x), n_updates, float(params.eta_max), params.theta,
            params.space, params.space_max, params.space_quantization_step,
            42, _pf64(zetas), len(zetas),
        )
        best = min(best, time.perf_counter() - t0)
    return {"seconds": best, "updates": n_updates,
            "updates_per_s": n_updates / best, "repeats": repeats}


def bench_native_1d_mt(
    workload: tuple = (1_000_000, 16, 250_000),
    n_updates_each: int = 2_000_000,
    n_workers: Optional[int] = None,
) -> Optional[dict]:
    """Multi-core CPU baseline: n_workers processes each running the
    C++ sequential oracle loop concurrently (the reference runs Hogwild
    over all cores, src/sgd.rs:413-593).  Each worker rebuilds the
    synthetic workload locally (a PathIndex doesn't pickle cheaply) and
    owns a private position array, so this measures compute +
    memory-bandwidth contention but not Hogwild's shared-array cache
    traffic — a generous upper-bound estimate of the reference's
    all-core rate."""
    import concurrent.futures
    import os

    from .native import available

    if not available():
        return None
    n_workers = n_workers or os.cpu_count() or 1

    t0 = time.perf_counter()
    with concurrent.futures.ProcessPoolExecutor(n_workers) as ex:
        futs = [
            ex.submit(_native_bench_worker, workload, n_updates_each)
            for _ in range(n_workers)
        ]
        rates = [f.result() for f in futs]
    wall = time.perf_counter() - t0
    total = n_updates_each * n_workers
    return {
        # sum of per-worker rates (workers time only their own bench
        # loop, excluding workload construction; the loops overlap, so
        # contention is captured) — the GENEROUS estimate used for
        # vs_baseline_mt
        "updates_per_s": float(np.sum(rates)),
        "updates_per_s_wall": total / wall,  # incl. construction overhead
        "updates": total,
        "seconds": wall,
        "n_workers": n_workers,
        "per_worker_median": float(np.median(rates)),
    }


def _native_bench_worker(workload: tuple, n_updates: int) -> float:
    pidx = synthetic_path_index(*workload, seed=0)
    r = bench_native_1d(pidx, n_updates)
    return r["updates_per_s"] if r else 0.0


def rank_quality(order_a: np.ndarray, order_b: np.ndarray) -> dict:
    """Rank agreement between two orderings of the same node set:
    mean absolute rank displacement (as a fraction of N) and Spearman
    correlation of the rank vectors."""
    n = len(order_a)
    ra = np.empty(n, np.int64)
    rb = np.empty(n, np.int64)
    ra[np.asarray(order_a)] = np.arange(n)
    rb[np.asarray(order_b)] = np.arange(n)
    disp = np.abs(ra - rb)
    sa = (ra - ra.mean()) / max(ra.std(), 1e-12)
    sb = (rb - rb.mean()) / max(rb.std(), 1e-12)
    return {
        "rank_mae_frac": float(disp.mean()) / max(n, 1),
        "spearman": float((sa * sb).mean()),
    }


def sweep_quality_vs_oracle(
    n_nodes: int = 100_000,
    n_paths: int = 4,
    steps_per_path: int = 100_000,
    iter_max: int = 30,
    **sweep_kw,
) -> Optional[dict]:
    """Self-certification for the bench: run the TIMED sweep
    configuration through a full schedule on a subsampled workload and
    compare the resulting node ordering against the bit-exact C++
    oracle on the same workload (VERDICT r1 Weak #1: the bench must
    measure the quality of the exact configuration it times)."""
    from .native import available, path_linear_sgd_native
    from .ops.sweep import path_linear_sgd_sweep

    if not available():
        return None
    pidx = synthetic_path_index(n_nodes, n_paths, steps_per_path, seed=7)
    p = PathSGDParams().derive_from_graph(pidx)
    p = replace(p, iter_max=iter_max, dtype="float32", pow_mode="fast")

    x_sweep = path_linear_sgd_sweep(None, p, pidx, **sweep_kw)
    po = replace(p, dtype="float64", pow_mode="fpp")
    x_oracle = path_linear_sgd_native(None, po, pidx)

    order_s = np.argsort(x_sweep, kind="stable")
    order_o = np.argsort(x_oracle, kind="stable")
    q = rank_quality(order_s, order_o)
    q["n_nodes"] = n_nodes
    q["iter_max"] = iter_max
    return q


def bench_sweep_nd(
    pidx: PathIndex, dims: int = 2, rounds: int = 48, repeats: int = 3,
    consensus_every: Optional[int] = None, rotate=None,
    active_frac: Optional[float] = None,
    dense_upto: Optional[int] = None, proposals: Optional[int] = None,
) -> dict:
    """Time the nD layout sweep engine (BASELINE configs 3-4; reference
    hot loop src/sgd.rs:988-1156)."""
    import jax

    from .ops.sweep_nd import build_sweep_nd_runner
    from .params import LayoutSGDParams

    from .ops.sweep_common import auto_sweep_config

    lp = LayoutSGDParams().derive_from_graph(pidx, dims)
    S = pidx.total_steps
    N = pidx.num_nodes
    frac = (active_frac if active_frac is not None
            else auto_sweep_config(S, N, layout=True)["active_frac"])
    ups = max(1, int(S * frac))
    lp = replace(lp, iter_max=rounds - 1, min_term_updates=ups,
                 dtype="float32", pow_mode="fast")

    run, arrays, make_state, info = build_sweep_nd_runner(
        pidx, lp, consensus_every=consensus_every, active_frac=frac,
        rotate=rotate, dense_upto=dense_upto, proposals=proposals,
    )
    from .ops.exact import layout_initial_coords

    init = layout_initial_coords(pidx, dims, lp.seed)
    key = jax.random.key(lp.seed)

    def once():
        cs0, csn0 = make_state(init)
        _ = np.asarray(csn0[:1, :1])
        t0 = time.perf_counter()
        out = run(cs0, csn0, key, *arrays)
        _ = np.asarray(jax.device_get(out[:1, :64]))
        dt = time.perf_counter() - t0
        return dt, np.asarray(jax.device_get(out))

    t0 = time.perf_counter()
    once()
    warmup = time.perf_counter() - t0
    best, xn = min((once() for _ in range(repeats)), key=lambda t: t[0])
    updates = info["n_sweeps"] * info["updates_per_sweep"]
    return {
        "seconds": best,
        "updates": updates,
        "updates_per_s": updates / best,
        "sweeps": info["n_sweeps"],
        "dims": dims,
        "final_finite": bool(np.isfinite(xn).all()),
        "consensus_every_eff": info["consensus_every"],
        "rotate_eff": info["rotate"],
        "proposals": info.get("proposals", 1),
        "warmup_s": warmup,
    }


def layout_quality_vs_oracle(
    n_nodes: int = 20_000,
    n_paths: int = 4,
    steps_per_path: int = 20_000,
    dims: int = 2,
    **sweep_kw,
) -> Optional[dict]:
    """Layout self-certification: sampled stress of the sweep layout vs
    the C++ oracle layout on the same subsampled workload (BASELINE
    metric 3: stress within tolerance)."""
    from .native import available, path_linear_sgd_layout_native
    from .ops.exact import calculate_layout_stress_pidx, layout_initial_coords
    from .ops.sweep_nd import path_linear_sgd_layout_sweep
    from .params import LayoutSGDParams

    if not available():
        return None
    pidx = synthetic_path_index(n_nodes, n_paths, steps_per_path, seed=11)
    lp = LayoutSGDParams().derive_from_graph(pidx, dims)
    lp = replace(lp, dtype="float32", pow_mode="fast")
    init = layout_initial_coords(pidx, dims, lp.seed)

    lay_s = path_linear_sgd_layout_sweep(
        None, lp, pidx, init_coords=init, **sweep_kw
    )
    lo = replace(lp, dtype="float64", pow_mode="fpp")
    lay_o = path_linear_sgd_layout_native(None, lo, pidx, init_coords=init)

    stress_s = calculate_layout_stress_pidx(pidx, lay_s, 10_000)
    stress_o = calculate_layout_stress_pidx(pidx, lay_o, 10_000)
    return {
        "stress": stress_s,
        "oracle_stress": stress_o,
        "ratio": stress_s / max(stress_o, 1e-12),
        "n_nodes": n_nodes,
        "dims": dims,
    }
