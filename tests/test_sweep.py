"""Offset-sweep engine tests (gather-free throughput mode)."""

from dataclasses import replace

import numpy as np
import pytest

from gfasort_tpu import PathIndex, YgsParams
from gfasort_tpu.io import gfa
from gfasort_tpu.ops.sweep import offset_set, path_sgd_sort_sweep, path_linear_sgd_sweep


def test_offset_set_structure():
    offs = offset_set(100, per_octave=4)
    assert offs[0] == 1
    assert offs[-1] <= 100
    assert (np.diff(offs) > 0).all()
    # dense at the bottom
    assert list(offs[:8]) == [1, 2, 3, 4, 5, 6, 7, 8]
    # a couple per octave above
    assert len(offs) < 40


def test_offset_set_small_space():
    assert list(offset_set(3)) == [1, 2, 3]
    assert list(offset_set(1)) == [1]


@pytest.mark.parametrize("name", ["simple.gfa", "lil.gfa"])
def test_sweep_quality_small(data_dir, name):
    from gfasort_tpu.ops.exact import path_sgd_sort_exact

    g = gfa.parse_gfa_numeric((data_dir / name).read_text())
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float32",
                pow_mode="fast")
    o = path_sgd_sort_sweep(g, p)
    oe = path_sgd_sort_exact(g, replace(p, dtype="float64", pow_mode="fpp"))
    assert sorted(h >> 1 for h in o) == sorted(h >> 1 for h in oe)
    re = {h >> 1: i for i, h in enumerate(oe)}
    assert all(abs(i - re[h >> 1]) <= 2 for i, h in enumerate(o))


def test_sweep_deterministic(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float32",
                pow_mode="fast")
    assert path_sgd_sort_sweep(g, p) == path_sgd_sort_sweep(g, p)


def test_sweep_pathless_nodes_keep_positions():
    from gfasort_tpu import BidirectedGraph
    from gfasort_tpu import handle as H

    g = BidirectedGraph()
    for i in (1, 2, 3, 4):
        g.add_node(i, b"ACGT")
    g.build_path("p", [(1, False), (2, False)])
    # nodes 3,4 are on no path
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float32",
                pow_mode="fast")
    pidx = PathIndex.from_graph(g)
    x = path_linear_sgd_sweep(g, p, pidx)
    x0 = pidx.initial_positions()
    # path-less nodes unchanged
    np.testing.assert_allclose(x[2:], x0[2:])


def test_sweep_no_paths_returns_none():
    from gfasort_tpu import BidirectedGraph

    g = BidirectedGraph()
    g.add_node(1, b"A")
    p = YgsParams().path_sgd
    assert path_linear_sgd_sweep(g, p) is None


def test_sweep_rotation_matches_full_set():
    """Bucket rotation (phase-strided large offsets) must agree with the
    full offset set on ordering quality: same node set, high rank
    correlation, and deterministic."""
    from dataclasses import replace as _r

    from gfasort_tpu.bench_util import synthetic_path_index

    pidx = synthetic_path_index(3000, 4, 6000, seed=3)
    from gfasort_tpu.params import PathSGDParams

    p = _r(
        PathSGDParams().derive_from_graph(pidx),
        dtype="float32", pow_mode="fast", iter_max=20,
    )
    x1 = path_linear_sgd_sweep(None, p, pidx, per_octave=2,
                               consensus_every=8, active_frac=0.5)
    x4 = path_linear_sgd_sweep(None, p, pidx, per_octave=2,
                               consensus_every=8, active_frac=0.5, rotate=4)
    assert np.isfinite(x4).all()
    # deterministic
    x4b = path_linear_sgd_sweep(None, p, pidx, per_octave=2,
                                consensus_every=8, active_frac=0.5, rotate=4)
    np.testing.assert_array_equal(x4, x4b)
    # rank agreement with the unrotated engine
    r1 = np.argsort(np.argsort(x1, kind="stable"), kind="stable")
    r4 = np.argsort(np.argsort(x4, kind="stable"), kind="stable")
    n = len(r1)
    rho = 1 - 6 * np.sum((r1 - r4) ** 2.0) / (n * (n**2 - 1))
    assert rho > 0.999, rho


def test_sweep_rotation_disabled_for_small_offset_sets(lil_gfa):
    """Tiny graphs have too few large buckets; rotate must fall back to
    the single-phase engine and produce identical output."""
    g = gfa.parse_gfa_numeric(lil_gfa)
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float32",
                pow_mode="fast")
    assert path_sgd_sort_sweep(g, p, rotate=4) == path_sgd_sort_sweep(g, p)


def test_chunked_dispatch_matches_single(monkeypatch, lil_gfa):
    """Splitting the schedule into many dispatches must not change the
    result: same periods, same keys, same consensus cadence (the chunk
    count divides the period count here, so no overshoot)."""
    from gfasort_tpu.ops import sweep as sweep_mod

    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    p = replace(
        YgsParams.from_graph(g).path_sgd,
        dtype="float32", pow_mode="fast", iter_max=15,
    )
    x1 = path_linear_sgd_sweep(g, p, pidx, consensus_every=4)
    monkeypatch.setenv("GFASORT_SWEEP_DISPATCH_ELEMS", "1")  # 1 period/dispatch
    x2 = path_linear_sgd_sweep(g, p, pidx, consensus_every=4)
    np.testing.assert_array_equal(x1, x2)


def test_auto_sweep_config_policy():
    """Shape-aware zero-kwarg policy (VERDICT r3 task 1): large few-path
    shapes get the certified throughput settings; small many-path loci
    keep conservative ones; active updates per node per sweep <= ~4."""
    from gfasort_tpu.ops.sweep_common import LARGE_S, auto_sweep_config

    big = auto_sweep_config(4_000_000, 1_000_000)  # bench shape, S/N=4
    assert big == dict(active_frac=1.0, consensus_every=96,
                       per_octave=2, rotate=12, dense_upto=4, proposals=12)
    small = auto_sweep_config(60_000, 5_000)  # DRB1-like, S/N=12
    assert small["consensus_every"] == 8 and small["per_octave"] == 4
    assert small["dense_upto"] == 8 and small["proposals"] == 1
    assert abs(small["active_frac"] - 5_000 / 60_000) < 1e-9
    # full activation only at low path redundancy (S/N <= 5)
    assert auto_sweep_config(5 * 1000, 1000)["active_frac"] == 1.0
    assert auto_sweep_config(6 * 1000, 1000)["active_frac"] < 1.0
    # boundary: the regime flips exactly at LARGE_S
    assert auto_sweep_config(LARGE_S, 100_000)["consensus_every"] == 96
    assert auto_sweep_config(LARGE_S - 1, 100_000)["consensus_every"] == 8
    # layout variant keeps the DRB1-validated small-regime settings
    lay = auto_sweep_config(35_059, 4_955, layout=True)  # real DRB1 shape
    assert lay == dict(active_frac=0.25, consensus_every=8,
                       per_octave=3, rotate=8, dense_upto=8, proposals=1)


def test_applied_counter_matches_manual_count():
    """build_applied_counter must equal a manual numpy count over the
    sampler's own output (one sweep, no period padding)."""
    import jax
    import jax.numpy as jnp

    from gfasort_tpu.bench_util import synthetic_path_index
    from gfasort_tpu.ops.fastpow import zeta_table
    from gfasort_tpu.ops.sweep import build_applied_counter, offset_set
    from gfasort_tpu.ops.sweep_common import make_offset_sampler
    from gfasort_tpu.params import PathSGDParams

    pidx = synthetic_path_index(2000, 3, 4000, seed=5)
    S = pidx.total_steps
    p = replace(
        PathSGDParams().derive_from_graph(pidx),
        dtype="float32", pow_mode="fast", iter_max=0,
        min_term_updates=S // 2,
    )
    cfg = dict(per_octave=3, consensus_every=1, active_frac=0.5, rotate=1)
    count_fn, arrays, info = build_applied_counter(pidx, p, **cfg)
    assert info["total_exec_sweeps"] == 1
    res = count_fn(jax.random.key(p.seed), *arrays)
    got = res["applied"]

    # manual: same keys, same sampler, numpy masks
    max_jump = max(1, min(int(p.space), pidx.max_path_step_count - 1))
    offs = offset_set(max_jump, 3)
    zetas = zeta_table(p.space, p.space_max, p.space_quantization_step,
                      p.theta)
    from gfasort_tpu.ops.sweep_common import sweep_rng

    _, _, sample_block = make_offset_sampler(offs, p, zetas, jnp.float32)
    key = jax.random.fold_in(jax.random.key(p.seed), 0)
    bits, u = sweep_rng(key, S, jnp.float32)
    sidx = np.asarray(jax.device_get(sample_block(
        bits, u, jnp.asarray(False), arrays[1], arrays[2], 0.5)))
    pos = pidx.step_pos
    manual = 0
    for ki, k in enumerate(offs.tolist()):
        fwd = np.flatnonzero(sidx == ki)
        manual += int(np.sum(pos[fwd] != pos[fwd + k]))
        bwd = np.flatnonzero(sidx == ~np.int32(ki))
        manual += int(np.sum(pos[bwd] != pos[bwd - k]))
    assert got == manual
    # proposed_actual must equal the replayed sampler's activations
    assert res["proposed_actual"] == int(np.sum(sidx != np.int32(0x7FFFFFF)))
    # 'proposed' = EXPECTED S·frac, not a bound: the activation draw
    # is binomial, so allow sampling spread around it
    assert 0 < got <= S
    assert abs(got - info["proposed"]) < 6 * (S * 0.25) ** 0.5


def test_consensus_auto_fallback_on_shuffled_ids():
    """The consensus auto policy must select the gather fallback when
    band locality fails (VERDICT r3 task 4's bracket, unit-level)."""
    from gfasort_tpu.bench_util import shuffled_path_index, synthetic_path_index
    from gfasort_tpu.ops.sweep import select_consensus

    # chromosome-scale shape: small node spaces sit below the grid's
    # coverage threshold even un-shuffled (measured 0.91 at 20k nodes)
    good = synthetic_path_index(100_000, 4, 100_000, seed=2)
    bad = shuffled_path_index(100_000, 4, 100_000, seed=2)
    import numpy as np

    g1 = select_consensus(good.step_node_idx, 100_000, np.float32,
                          good.step_path)
    g2 = select_consensus(bad.step_node_idx, 100_000, np.float32,
                          bad.step_path)
    assert type(g1).__name__ == "GridConsensus"
    assert type(g2).__name__ == "GatherConsensus"
    # the shuffled index preserves path structure and distances
    np.testing.assert_array_equal(good.step_pos, bad.step_pos)
    np.testing.assert_array_equal(good.step_rank, bad.step_rank)


def test_fit_consensus_period():
    from gfasort_tpu.ops.sweep_common import fit_consensus_period as f

    assert f(96, 96, 12) == 96       # exact fit unchanged
    assert f(101, 96, 12) == 60      # 2 periods of 60 >= 101, minimal pad
    assert f(31, 96, 12) == 36       # single shrunken period
    assert f(303, 8, 1) == 8
    for n, ce, ph in ((1, 8, 1), (7, 96, 12), (1000, 48, 12)):
        got = f(n, ce, ph)
        assert 1 <= got <= max(ce, ph) and got % ph == 0
        periods = -(-n // got)
        assert periods * got >= n            # covers the schedule
        assert periods == -(-n // max(ce, ph)) or ce < ph  # period count kept


def test_multi_proposal_sweep_runs_and_certifies():
    """proposals=2 (r5): P independent proposals per sweep share one
    bucket pass.  The engine must stay finite and land near the P=1
    ordering on a synthetic chromosome-like workload."""
    from gfasort_tpu.bench_util import rank_quality, synthetic_path_index
    from gfasort_tpu.params import PathSGDParams

    pidx = synthetic_path_index(3000, 4, 6000, seed=3)
    p = replace(
        PathSGDParams().derive_from_graph(pidx),
        dtype="float32", pow_mode="fast", iter_max=20,
    )
    x1, x2 = (
        path_linear_sgd_sweep(None, p, pidx, per_octave=2,
                              consensus_every=4, active_frac=1.0,
                              proposals=pp)
        for pp in (1, 2)
    )
    assert np.isfinite(x1).all() and np.isfinite(x2).all()
    q = rank_quality(np.argsort(x1, kind="stable"),
                     np.argsort(x2, kind="stable"))
    assert q["spearman"] > 0.99


def test_multi_proposal_counter_matches_manual():
    """The applied counter must replay the engine's per-proposal key
    schedule exactly (P=2, one sweep)."""
    import jax
    import jax.numpy as jnp

    from gfasort_tpu.bench_util import synthetic_path_index
    from gfasort_tpu.ops.fastpow import zeta_table
    from gfasort_tpu.ops.sweep import build_applied_counter
    from gfasort_tpu.ops.sweep_common import (INACTIVE, make_offset_sampler,
                                              sweep_rng)
    from gfasort_tpu.params import PathSGDParams

    pidx = synthetic_path_index(1500, 3, 3000, seed=9)
    S = pidx.total_steps
    p = replace(
        PathSGDParams().derive_from_graph(pidx),
        dtype="float32", pow_mode="fast", iter_max=0,
        min_term_updates=1,
    )
    cfg = dict(per_octave=3, consensus_every=1, active_frac=1.0,
               rotate=1, proposals=2)
    count_fn, arrays, info = build_applied_counter(pidx, p, **cfg)
    assert info["total_exec_sweeps"] == 1
    assert info["updates_per_sweep"] == 2 * S
    res = count_fn(jax.random.key(p.seed), *arrays)

    from gfasort_tpu.ops.sweep import offset_set

    max_jump = max(1, min(int(p.space), pidx.max_path_step_count - 1))
    offs = offset_set(max_jump, 3)
    zetas = zeta_table(p.space, p.space_max, p.space_quantization_step,
                      p.theta)
    _, _, sample_block = make_offset_sampler(offs, p, zetas, jnp.float32)
    key = jax.random.fold_in(jax.random.key(p.seed), 0)
    pos = pidx.step_pos
    manual = proposed = 0
    for pi in range(2):
        kp = jax.random.fold_in(key, pi)
        bits, u = sweep_rng(kp, S, jnp.float32)
        sidx = np.asarray(jax.device_get(sample_block(
            bits, u, jnp.asarray(False), arrays[1], arrays[2], 1.0)))
        proposed += int(np.sum(sidx != INACTIVE))
        for ki, k in enumerate(offs.tolist()):
            fwd = np.flatnonzero(sidx == ki)
            manual += int(np.sum(pos[fwd] != pos[fwd + k]))
            bwd = np.flatnonzero(sidx == ~np.int32(ki))
            manual += int(np.sum(pos[bwd] != pos[bwd - k]))
    assert res["applied"] == manual
    assert res["proposed_actual"] == proposed


def test_sample_blocks_bit_identical():
    """sample_block.multi (r5.2 shared-chain sampler) must be
    BIT-identical to P independent sample_block calls — it is a pure
    restructuring (elementwise ops commute with jnp.where), both snap
    modes, warm and cooling, frac<1 and frac=1."""
    import jax
    import jax.numpy as jnp

    from gfasort_tpu.bench_util import synthetic_path_index
    from gfasort_tpu.ops.fastpow import zeta_table
    from gfasort_tpu.ops import sweep_common as sc
    from gfasort_tpu.params import PathSGDParams

    pidx = synthetic_path_index(2000, 4, 5000, seed=11)
    p = replace(
        PathSGDParams().derive_from_graph(pidx),
        dtype="float32", pow_mode="fast",
    )
    zetas = zeta_table(p.space, p.space_max, p.space_quantization_step,
                       p.theta)
    offs = np.array([1, 2, 3, 4, 6, 8, 13, 37, 256])
    S = pidx.total_steps
    rank_a = jnp.asarray(pidx.step_rank.astype(np.int32))
    cnt_a = jnp.asarray(
        pidx.step_count_of_step.astype(np.int32))
    for mode in ("stoch", "down"):
        import os
        old = os.environ.get("GFASORT_SNAP")
        os.environ["GFASORT_SNAP"] = mode
        try:
            _, _, sb = sc.make_offset_sampler(
                offs, p, zetas, jnp.float32)
        finally:
            if old is None:
                os.environ.pop("GFASORT_SNAP", None)
            else:
                os.environ["GFASORT_SNAP"] = old
        for cooling in (False, True):
            for frac in (1.0, 0.6):
                key = jax.random.key(42)
                bu = [sc.sweep_rng(jax.random.fold_in(key, pi),
                                   S, jnp.float32)
                      for pi in range(3)]
                ref = [np.asarray(sb(b, u, cooling, rank_a, cnt_a, frac))
                       for b, u in bu]
                got = [np.asarray(x) for x in sb.multi(
                    bu, cooling, rank_a, cnt_a, frac)]
                for r, g in zip(ref, got):
                    np.testing.assert_array_equal(r, g)
