"""TPU batched-synchronous path SGD engines (1D sort and nD layout).

This is the device replacement for the reference's Hogwild scheme
(gfasort ``src/sgd.rs:334-601`` 1D, ``:893-1172`` nD; SURVEY.md §2
"Parallelism & communication"):

======================================  =================================
reference (CPU threads)                 this engine (TPU)
======================================  =================================
N workers, racy f64 atomics             B-wide synchronous rounds:
  load-then-store, Relaxed order          sample B terms, compute deltas
                                          against a snapshot, scatter-add
checker thread + update counter         static schedule: R = (iter_max+1)
  polled every 1 ms                       × ceil(mtu/B) rounds; eta/theta
                                          indexed per round on device
Xoshiro256Plus per thread               counter-based threefry keys
  (seed + tid)                            fold_in(seed, round)
per-pair DirtyZipfian via               vectorized inverse-CDF over the
  fast_precise_pow                        precomputed zeta table; pow_mode
                                          "fpp" reproduces the bit hack,
                                          "fast" uses exp/log
======================================  =================================

The whole run is ONE jitted computation: a ``lax.fori_loop`` over rounds
with positions donated, so positions live in HBM for the entire
optimization and the host is only touched at the end.  Skipped samples
(single-step path, rank_a == rank_b, zero distance) contribute zero
delta; each round attempts exactly ``batch`` terms, so an iteration
performs ≥ ``min_term_updates`` attempts — the deterministic analog of
the reference's nondeterministic overshoot (SURVEY.md §8.1).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

from ..graph import BidirectedGraph
from ..index import PathIndex
from ..io.layout_tsv import Layout
from ..params import LayoutSGDParams, PathSGDParams
from .fastpow import zeta_table
from .schedule import eta_schedule

__all__ = [
    "DeviceIndex",
    "build_1d_runner",
    "build_schedule",
    "path_linear_sgd_batched",
    "path_sgd_sort_batched",
    "path_linear_sgd_layout_batched",
]


@dataclass(frozen=True)
class DeviceIndex:
    """Path index arrays staged for device upload (HBM residents)."""

    step_path: np.ndarray       # [S] int32
    step_rank: np.ndarray       # [S] int32
    step_pos: np.ndarray        # [S] float (bp offset)
    step_node: np.ndarray       # [S] int32 (dense SGD node index)
    step_rev: np.ndarray        # [S] int32 (orientation bit; nD only)
    path_first: np.ndarray      # [P] int32
    path_count: np.ndarray      # [P] int32
    node_len: np.ndarray        # [N] float (nD only)
    total_steps: int
    num_nodes: int

    @classmethod
    def from_path_index(cls, pidx: PathIndex, dtype=np.float32) -> "DeviceIndex":
        return cls(
            step_path=pidx.step_path.astype(np.int32),
            step_rank=pidx.step_rank.astype(np.int32),
            step_pos=pidx.step_pos.astype(dtype),
            step_node=pidx.step_node_idx.astype(np.int32),
            step_rev=(pidx.step_handle & 1).astype(np.int32),
            path_first=pidx.path_first.astype(np.int32),
            path_count=pidx.path_count.astype(np.int32),
            node_len=pidx.node_len.astype(dtype),
            total_steps=pidx.total_steps,
            num_nodes=pidx.num_nodes,
        )


def build_schedule(params, batch: int):
    """Per-round eta/cooling arrays.  Returns (etas_r, cooling_r,
    rounds_per_iter, n_rounds)."""
    etas = eta_schedule(
        1.0 / params.eta_max, 1.0, params.iter_max,
        params.iter_with_max_learning_rate, params.eps,
    )
    rpi = max(1, -(-params.min_term_updates // batch))  # ceil
    fci = params.first_cooling_iteration
    round_eta = np.repeat(etas, rpi)
    round_cooling = np.repeat(
        np.arange(params.iter_max + 1) > fci, rpi
    )
    return round_eta, round_cooling, rpi, len(round_eta)


def _f(dtype):
    import jax.numpy as jnp

    return {np.float32: jnp.float32, np.float64: jnp.float64}[dtype]


def _pow_builder(pow_mode: str, sample_dtype):
    """Returns pow(a, b, e_static) honoring the parity mode."""
    import jax.numpy as jnp

    if pow_mode == "fpp":
        from .fastpow import fast_precise_pow_jax

        def powf(a, b, e):
            return fast_precise_pow_jax(a, b, e).astype(sample_dtype)

        return powf

    def powf(a, b, e):  # noqa: ARG001 (e unused in fast mode)
        a = jnp.asarray(a, dtype=sample_dtype)
        return jnp.where(a > 0, jnp.exp(b * jnp.log(jnp.maximum(a, 1e-30))), 0.0)

    return powf


def effective_batch(params) -> int:
    """Clamp the round width to min_term_updates so small graphs keep
    the reference's per-iteration work (a round never attempts more
    than one iteration's worth of terms)."""
    return max(1, min(int(params.batch), int(params.min_term_updates)))


def _make_sampler(di: DeviceIndex, params, zetas: np.ndarray, sample_dtype,
                  batch: Optional[int] = None):
    """Builds sample_pairs(key, theta_is_cooling, cooling, lo, span) ->
    (sa, sb, valid, term_dist_recip_masked...) — the shared Zipfian
    second-step sampler (src/sgd.rs:442-516 semantics, vectorized)."""
    import jax
    import jax.numpy as jnp

    powf = _pow_builder(params.pow_mode, sample_dtype)
    theta0 = float(params.theta)
    theta_cool = 0.001
    alpha_e0 = int(1.0 / (1.0 - theta0)) if theta0 != 1.0 else 0
    alpha_e1 = int(1.0 / (1.0 - theta_cool))
    space = int(params.space)
    space_max = int(params.space_max)
    quant = int(params.space_quantization_step)
    B = int(batch) if batch is not None else effective_batch(params)

    step_path = jnp.asarray(di.step_path)
    step_rank = jnp.asarray(di.step_rank)
    path_first = jnp.asarray(di.path_first)
    path_count = jnp.asarray(di.path_count)
    zetas_j = jnp.asarray(zetas, dtype=sample_dtype)

    def zipf_ranks(u, jump_space, theta, alpha_e):
        """Vectorized DirtyZipfian over [1, jump_space]
        (src/sgd.rs:110-151)."""
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

    def sample_pairs(key, cooling, lo, span):
        """Sample B (step_a, rank_b) pairs from steps [lo, lo+span)."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        sa = lo + jax.random.randint(k1, (B,), 0, span, dtype=jnp.int32)
        p = step_path[sa]
        cnt = path_count[p]
        rank_a = step_rank[sa]

        coin1 = jax.random.bernoulli(k2, 0.5, (B,))
        use_zipf = cooling | coin1
        coin2 = jax.random.bernoulli(k3, 0.5, (B,))
        backward = (rank_a > 0) & (coin2 | (rank_a == cnt - 1))
        forward = (~backward) & (rank_a < cnt - 1)
        avail = jnp.where(backward, rank_a, cnt - 1 - rank_a)
        jump_space = jnp.minimum(space, avail)

        u = jax.random.uniform(k4, (B,), dtype=sample_dtype)

        def zipf_for(theta, alpha_e):
            return zipf_ranks(u, jump_space, jnp.asarray(theta, sample_dtype), alpha_e)

        z = jax.lax.cond(
            cooling,
            lambda: zipf_for(theta_cool, alpha_e1),
            lambda: zipf_for(theta0, alpha_e0),
        )
        rank_b_zipf = jnp.where(
            backward,
            rank_a - jnp.minimum(z, rank_a),
            jnp.where(forward, jnp.minimum(rank_a + z, cnt - 1), rank_a),
        )
        rank_b_unif = jax.random.randint(k5, (B,), 0, jnp.maximum(cnt, 1), dtype=jnp.int32)
        rank_b = jnp.where(use_zipf, rank_b_zipf, rank_b_unif)

        valid = (cnt != 1) & (rank_a != rank_b)
        sb = path_first[p] + rank_b
        return sa, sb, valid

    return sample_pairs


def build_1d_runner(
    pidx: PathIndex, params: PathSGDParams, segment_rounds: Optional[int] = None
):
    """Construct the jitted full-run function for the 1D engine.
    Returns (run, make_x0, n_rounds): run(x, base_key[, start]) executes
    the round loop on device (x donated per call); make_x0() builds a
    fresh initial-position device array.  With ``segment_rounds`` set,
    ``run(x, key, start)`` executes rounds [start, start+segment_rounds)
    — rounds past the schedule are no-ops (eta 0) — enabling
    checkpoint/resume between segments.  Used by the engine, bench.py,
    and the checkpoint runner (timing reuses one compiled executable)."""
    import jax
    import jax.numpy as jnp

    dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    sample_dtype = jnp.float64 if params.pow_mode == "fpp" else _f(dtype)
    if params.pow_mode == "fpp" and not jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", True)

    di = DeviceIndex.from_path_index(pidx, dtype)
    zetas = zeta_table(
        params.space, params.space_max, params.space_quantization_step,
        params.theta,
    )
    B = effective_batch(params)
    round_eta, round_cooling, rpi, n_rounds = build_schedule(params, B)

    sample_pairs = _make_sampler(di, params, zetas, sample_dtype, B)
    step_pos = jnp.asarray(di.step_pos)
    step_node = jnp.asarray(di.step_node)
    if segment_rounds is not None:
        # pad the schedule so out-of-range rounds are no-ops (eta 0)
        pad = segment_rounds
        round_eta = np.concatenate([round_eta, np.zeros(pad)])
        round_cooling = np.concatenate([round_cooling, np.zeros(pad, bool)])
    etas_r = jnp.asarray(round_eta, dtype=_f(dtype))
    cool_r = jnp.asarray(round_cooling)
    S = di.total_steps
    fdt = _f(dtype)

    @partial(jax.jit, donate_argnums=(0,))
    def run(x, base_key, start=0):
        def round_body(rr, x):
            r = jnp.minimum(rr + start, len(round_eta) - 1) if segment_rounds is not None else rr
            key = jax.random.fold_in(base_key, r)
            sa, sb, valid = sample_pairs(key, cool_r[r], 0, S)
            pos_a = step_pos[sa]
            pos_b = step_pos[sb]
            term_dist = jnp.abs(pos_a - pos_b)
            valid_r = valid & (term_dist != 0)
            safe_dist = jnp.where(valid_r, term_dist, 1.0)
            mu = jnp.minimum(etas_r[r] / safe_dist, 1.0)
            i = step_node[sa]
            j = step_node[sb]
            dx = x[i] - x[j]
            dx = jnp.where(dx == 0, fdt(1e-9), dx)
            mag = jnp.abs(dx)
            # (delta/|dx|)*dx == delta*sign(dx): one divide per update
            # (mirrors the sweep engines, ops/sweep_dense.py)
            sgn = jnp.where(dx >= 0, fdt(1.0), fdt(-1.0))
            delta = mu * (mag - safe_dist) / 2.0
            r_x = jnp.where(valid_r, delta * sgn, fdt(0))
            # Collision-aware merge: within a round, a node hit by k
            # pairs receives the MEAN of its k half-corrections, not the
            # sum — summing overshoots by k and diverges on small graphs
            # (SURVEY.md §9 "hard parts").  With B ≲ N collisions are
            # rare and this is sequential-equivalent.
            one = valid_r.astype(x.dtype)
            dsum = jnp.zeros_like(x).at[i].add(-r_x).at[j].add(r_x)
            cnt = jnp.zeros_like(x).at[i].add(one).at[j].add(one)
            return x + dsum / jnp.maximum(cnt, 1)

        loop_n = segment_rounds if segment_rounds is not None else n_rounds
        return jax.lax.fori_loop(0, loop_n, round_body, x)

    def make_x0(x0=None):
        return jnp.asarray(
            x0 if x0 is not None else pidx.initial_positions(), dtype=fdt
        )

    return run, make_x0, n_rounds


def path_linear_sgd_batched(
    graph: BidirectedGraph,
    params: PathSGDParams,
    pidx: Optional[PathIndex] = None,
    x0: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """1D path SGD on device; returns final positions x[idx] (host
    numpy) or None when no multi-step path exists."""
    import jax

    pidx = pidx or PathIndex.from_graph(graph)
    if pidx.num_nodes == 0:
        return np.zeros(0)
    if not pidx.has_multi_step_path():
        return None
    run, make_x0, _n = build_1d_runner(pidx, params)
    x_final = run(make_x0(x0), jax.random.key(params.seed))
    return np.asarray(jax.device_get(x_final), dtype=np.float64)


def path_sgd_sort_batched(graph: BidirectedGraph, params: PathSGDParams):
    """Handle ordering from the batched engine (stable sort by final
    position, src/sgd.rs:641-672 semantics)."""
    from .. import handle as H

    pidx = PathIndex.from_graph(graph)
    x = path_linear_sgd_batched(graph, params, pidx)
    if x is None or len(x) == 0:
        return []
    order = np.argsort(x, kind="stable")
    return [H.forward(int(pidx.node_ids[idx])) for idx in order]


def path_linear_sgd_layout_batched(
    graph: BidirectedGraph,
    params: LayoutSGDParams,
    pidx: Optional[PathIndex] = None,
    init_coords: Optional[np.ndarray] = None,
) -> Layout:
    """nD layout SGD on device: state [2N, D], two ends per node
    (src/sgd.rs:773-1188 semantics, batched)."""
    import jax
    import jax.numpy as jnp

    pidx = pidx or PathIndex.from_graph(graph)
    n = pidx.num_nodes
    dims = params.dimensions
    if n == 0:
        return Layout(dims, 0)
    if not pidx.has_multi_step_path():
        return Layout(dims, n)

    dtype = {"float32": np.float32, "float64": np.float64}[params.dtype]
    sample_dtype = jnp.float64 if params.pow_mode == "fpp" else _f(dtype)
    if params.pow_mode == "fpp" and not jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", True)

    di = DeviceIndex.from_path_index(pidx, dtype)
    zetas = zeta_table(
        params.space, params.space_max, params.space_quantization_step,
        params.theta,
    )
    B = effective_batch(params)
    round_eta, round_cooling, rpi, n_rounds = build_schedule(params, B)
    sample_pairs = _make_sampler(di, params, zetas, sample_dtype, B)

    step_pos = jnp.asarray(di.step_pos)
    step_node = jnp.asarray(di.step_node)
    step_rev = jnp.asarray(di.step_rev)
    node_len = jnp.asarray(di.node_len)
    etas_r = jnp.asarray(round_eta, dtype=_f(dtype))
    cool_r = jnp.asarray(round_cooling)
    S = di.total_steps
    fdt = _f(dtype)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, base_key):
        def round_body(r, state):
            key = jax.random.fold_in(base_key, r)
            kmain, ka, kb = jax.random.split(key, 3)
            sa, sb, valid = sample_pairs(kmain, cool_r[r], 0, S)
            pos_a = step_pos[sa]
            pos_b = step_pos[sb]
            i = step_node[sa]
            j = step_node[sb]
            i_rev = step_rev[sa]
            j_rev = step_rev[sb]

            # random end choice per term (rs:1060-1077)
            other_a = jax.random.bernoulli(ka, 0.5, pos_a.shape)
            other_b = jax.random.bernoulli(kb, 0.5, pos_b.shape)
            pos_a = jnp.where(other_a, pos_a + node_len[i], pos_a)
            pos_b = jnp.where(other_b, pos_b + node_len[j], pos_b)
            end_a = jnp.where(other_a, 1 - i_rev, i_rev)
            end_b = jnp.where(other_b, 1 - j_rev, j_rev)

            term_dist = jnp.abs(pos_a - pos_b)
            valid_r = valid & (term_dist != 0)
            safe_dist = jnp.where(valid_r, term_dist, 1.0)
            mu = jnp.minimum(etas_r[r] / safe_dist, 1.0)

            idx_i = i * 2 + end_a
            idx_j = j * 2 + end_b
            ci = state[idx_i]          # [B, D]
            cj = state[idx_j]
            deltas = ci - cj
            mag_sq = jnp.sum(deltas * deltas, axis=-1)
            zero = mag_sq == 0
            deltas = deltas.at[:, 0].set(
                jnp.where(zero, fdt(1e-9), deltas[:, 0])
            )
            mag_sq = jnp.where(zero, fdt(1e-18), mag_sq)
            # rsqrt instead of sqrt + divide (ops/sweep_dense.py)
            inv = jax.lax.rsqrt(mag_sq)
            mag = mag_sq * inv
            delta = mu * (mag - safe_dist) / 2.0
            r_scale = jnp.where(valid_r, delta * inv, fdt(0))
            upd = r_scale[:, None] * deltas  # [B, D]
            # Collision-aware merge (see 1D round_body): mean per end row.
            one = valid_r.astype(state.dtype)
            dsum = jnp.zeros_like(state).at[idx_i].add(-upd).at[idx_j].add(upd)
            cnt = jnp.zeros(state.shape[0], state.dtype).at[idx_i].add(one).at[idx_j].add(one)
            return state + dsum / jnp.maximum(cnt, 1)[:, None]

        return jax.lax.fori_loop(0, n_rounds, round_body, state)

    if init_coords is None:
        from .exact import layout_initial_coords

        init_coords = layout_initial_coords(pidx, dims, params.seed)
    state = jnp.asarray(init_coords, dtype=fdt)
    final = run(state, jax.random.key(params.seed))
    return Layout.from_state(np.asarray(jax.device_get(final), dtype=np.float64))
