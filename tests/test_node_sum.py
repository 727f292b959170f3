"""Gather-sum node consensus correctness vs plain scatter-mean."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gfasort_tpu.ops.node_sum import build_gather_consensus


def plain(node, xs, n):
    ssum = np.zeros(n)
    scnt = np.zeros(n)
    np.add.at(ssum, node, xs)
    np.add.at(scnt, node, 1)
    x_node = ssum / np.maximum(scnt, 1)
    return x_node[node], x_node


@pytest.mark.parametrize("cap,seed", [(128, 0), (4, 1)])
def test_gather_consensus_matches_plain(cap, seed):
    rng = np.random.default_rng(seed)
    S, N = 5000, 800
    node = rng.integers(0, N, S).astype(np.int64)
    # a couple of very high degree nodes to exercise the big fallback
    node[:400] = 7
    node[400:600] = 13
    gc = build_gather_consensus(node, N, cap=cap)
    xs = rng.normal(size=S).astype(np.float32) * 10
    xs_new, xn_sorted = gc.fn(jnp.asarray(xs), *gc.arrays)
    xs_ref, x_ref = plain(node, xs, N)
    np.testing.assert_allclose(np.asarray(xs_new), xs_ref, rtol=1e-5, atol=1e-5)
    # node-order conversion: step-less nodes keep init values
    init = jnp.asarray(rng.normal(size=N).astype(np.float32))
    x_node = np.asarray(gc.to_node_order(xn_sorted, init, *gc.arrays))
    live = np.zeros(N, bool)
    live[node] = True
    np.testing.assert_allclose(x_node[live], x_ref[live], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(x_node[~live], np.asarray(init)[~live])


def test_gather_consensus_degree_one_only():
    node = np.arange(64, dtype=np.int64)
    gc = build_gather_consensus(node, 64)
    xs = np.arange(64, dtype=np.float32)
    xs_new, _ = gc.fn(jnp.asarray(xs), *gc.arrays)
    np.testing.assert_allclose(np.asarray(xs_new), xs)
