"""Grid consensus (ops/grid_consensus.py): exactness vs scatter-mean,
multi-row sharing, out-of-band fallback, and the selection policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfasort_tpu.ops.grid_consensus import (
    GridConsensus,
    build_grid_consensus,
    choose_grid_geometry,
    plan_grid,
)
from gfasort_tpu.ops.node_sum import GatherConsensus
from gfasort_tpu.ops.sweep import select_consensus


def ref_consensus(step_node, xs, n_nodes):
    cnt = np.bincount(step_node, minlength=n_nodes).astype(np.float64)
    ssum = np.zeros(n_nodes)
    np.add.at(ssum, step_node, np.asarray(xs, dtype=np.float64))
    x_node = ssum / np.maximum(cnt, 1)
    return x_node[step_node], x_node, cnt


def walk_workload(n_nodes, n_paths, steps, seed=0, jitter=50):
    """Monotone noisy walks — the pangenome locality pattern."""
    rng = np.random.default_rng(seed)
    parts, paths = [], []
    for p in range(n_paths):
        base = np.sort(rng.integers(0, n_nodes, size=steps))
        nodes = np.clip(base + rng.integers(-jitter, jitter + 1, steps), 0, n_nodes - 1)
        parts.append(nodes)
        paths.append(np.full(steps, p))
    return np.concatenate(parts), np.concatenate(paths)


@pytest.mark.parametrize("n_nodes,n_paths,steps", [
    (5_000, 4, 4_000),
    (300, 3, 2_000),      # dense: many steps per node
    (50_000, 2, 1_000),   # sparse: most nodes stepless
])
def test_grid_matches_scatter_mean(n_nodes, n_paths, steps):
    step_node, step_path = walk_workload(n_nodes, n_paths, steps)
    gc = build_grid_consensus(step_node, n_nodes)
    assert gc.fn is not None
    xs = np.random.default_rng(1).random(len(step_node)).astype(np.float32) * 1e5
    xs_ref, xn_ref, cnt = ref_consensus(step_node, xs, n_nodes)
    xs_new, x_node = jax.jit(lambda x: gc.fn(x, *gc.arrays))(jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(xs_new), xs_ref, rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(x_node)[cnt > 0], xn_ref[cnt > 0], rtol=2e-6
    )


def test_grid_multi_row_matches_per_row():
    n_nodes, R = 3_000, 4
    step_node, _ = walk_workload(n_nodes, 3, 3_000)
    S = len(step_node)
    gc = build_grid_consensus(step_node, n_nodes)
    xs = np.random.default_rng(2).random((R, S)).astype(np.float32) * 1e4
    xs_new, x_node = jax.jit(lambda x: gc.fn(x, *gc.arrays))(jnp.asarray(xs))
    assert xs_new.shape == (R, S) and x_node.shape == (R, n_nodes)
    for r in range(R):
        xs_ref, xn_ref, cnt = ref_consensus(step_node, xs[r], n_nodes)
        np.testing.assert_allclose(np.asarray(xs_new[r]), xs_ref, rtol=2e-6)
        np.testing.assert_allclose(
            np.asarray(x_node[r])[cnt > 0], xn_ref[cnt > 0], rtol=2e-6
        )


def test_grid_exact_with_wild_steps():
    """A few % of totally random (non-local) steps must go through the
    element fallback and still be EXACT."""
    n_nodes = 4_000
    step_node, _ = walk_workload(n_nodes, 2, 3_000)
    rng = np.random.default_rng(3)
    wild = rng.random(len(step_node)) < 0.03
    step_node = step_node.copy()
    step_node[wild] = rng.integers(0, n_nodes, wild.sum())
    gc = build_grid_consensus(step_node, n_nodes)
    assert gc.fn is not None
    assert gc.coverage < 1.0  # some oob steps exist
    xs = rng.random(len(step_node)).astype(np.float32) * 1e4
    xs_ref, xn_ref, cnt = ref_consensus(step_node, xs, n_nodes)
    xs_new, x_node = jax.jit(lambda x: gc.fn(x, *gc.arrays))(jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(xs_new), xs_ref, rtol=2e-6)


def test_grid_tiny_graph():
    step_node = np.array([0, 1, 2, 1, 0, 3, 3, 2])
    gc = build_grid_consensus(step_node, 5)
    xs = np.arange(8, dtype=np.float32)
    xs_ref, xn_ref, cnt = ref_consensus(step_node, xs, 5)
    xs_new, x_node = jax.jit(lambda x: gc.fn(x, *gc.arrays))(jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(xs_new), xs_ref, rtol=1e-6)
    # stepless node keeps its init via to_node_order
    init = jnp.full(5, -7.0)
    xn2 = gc.to_node_order(x_node, init, *gc.arrays)
    assert float(xn2[4]) == -7.0


def test_selection_policy_falls_back_on_shuffled_input():
    rng = np.random.default_rng(4)
    step_node = rng.integers(0, 50_000, size=200_000)  # no locality
    gx = build_grid_consensus(step_node, 50_000)
    assert gx.fn is None or gx.coverage < 0.97
    gc = select_consensus(step_node, 50_000, np.float32)
    assert isinstance(gc, GatherConsensus)


def test_selection_policy_uses_grid_on_walks():
    # long paths (many tiles per path) — the scale where grid consensus
    # matters; short paths fall back (mixed-segment loss dominates)
    step_node, step_path = walk_workload(100_000, 4, 100_000)
    gc = select_consensus(step_node, 100_000, np.float32, step_path)
    assert isinstance(gc, GridConsensus)
    # f64 stays on gather-sum (grid dots accumulate in f32)
    gc64 = select_consensus(step_node, 100_000, np.float64, step_path)
    assert isinstance(gc64, GatherConsensus)


def test_plan_grid_shard_padding():
    """Shard builders pad plans to common (n_seg, n_oob) shapes."""
    step_node, step_path = walk_workload(10_000, 2, 5_000)
    D, W, m = choose_grid_geometry(step_node, 256, 32, 4096, step_path)
    plan = plan_grid(step_node, 10_000, 256, 32, D, W, n_seg=64,
                     n_oob_pad=8192, path_of_step=step_path)
    assert plan.anchors.shape == (64,)
    assert plan.oob_steps.shape == (8192,)
    # sentinel entries point at the padded zero slot
    assert plan.oob_steps[-1] == plan.S_pad


@pytest.mark.parametrize("merge", ["dot", "scan"])
@pytest.mark.parametrize("lane", ["64", "128"])
def test_merge_and_lane_variants_agree(monkeypatch, merge, lane):
    """Both window->node merge strategies (placement dot / segment
    scan) and both one-hot lane splits must match the exact
    scatter-mean — they are selected rows-aware for speed only (r4)."""
    monkeypatch.setenv("GFASORT_GC_MERGE", merge)
    monkeypatch.setenv("GFASORT_GC_LANE", lane)
    step_node, step_path = walk_workload(5_000, 4, 4_000, seed=3)
    gc = build_grid_consensus(step_node, 5_000, path_of_step=step_path)
    assert gc.fn is not None
    xs = np.random.default_rng(2).random(len(step_node)).astype(np.float32) * 1e5
    xs_ref, xn_ref, cnt = ref_consensus(step_node, xs, 5_000)
    xs_new, x_node = jax.jit(lambda x: gc.fn(x, *gc.arrays))(jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(xs_new), xs_ref, rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(x_node)[cnt > 0], xn_ref[cnt > 0], rtol=2e-6
    )
    # multi-row too (the nD layout path)
    xs4 = np.random.default_rng(4).random((4, len(step_node))).astype(np.float32)
    out4, xn4 = jax.jit(lambda x: gc.fn(x, *gc.arrays))(jnp.asarray(xs4))
    for r in range(4):
        r_ref, n_ref, _ = ref_consensus(step_node, xs4[r], 5_000)
        np.testing.assert_allclose(np.asarray(out4)[r], r_ref, rtol=2e-5)
