"""Banded consensus correctness vs plain scatter-mean."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gfasort_tpu.ops.consensus import build_banded_consensus


def plain(node, xs, n):
    ssum = np.zeros(n)
    scnt = np.zeros(n)
    np.add.at(ssum, node, xs)
    np.add.at(scnt, node, 1)
    x_node = ssum / np.maximum(scnt, 1)
    return x_node[node], x_node


@pytest.mark.parametrize("wild_frac", [0.0, 0.02, 0.3])
def test_banded_matches_plain(wild_frac):
    rng = np.random.default_rng(1)
    S, N = 5000, 1500
    base = np.sort(rng.integers(0, N, S))
    node = np.clip(base + rng.integers(-20, 21, S), 0, N - 1).astype(np.int64)
    n_wild = int(S * wild_frac)
    if n_wild:
        w = rng.integers(0, S, n_wild)
        node[w] = rng.integers(0, N, n_wild)
    bc = build_banded_consensus(node, N, tile=128, window=256)
    xs = rng.normal(size=S).astype(np.float32)
    xs_new, x_node = bc.consensus(jnp.asarray(xs))
    xs_ref, x_ref = plain(node, xs, N)
    np.testing.assert_allclose(np.asarray(x_node), x_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xs_new), xs_ref, atol=1e-4)


def test_banded_tiny_graph():
    node = np.array([0, 1, 1, 2, 0], dtype=np.int64)
    bc = build_banded_consensus(node, 3, tile=4, window=8)
    xs = np.array([1.0, 2.0, 4.0, 8.0, 3.0], dtype=np.float32)
    xs_new, x_node = bc.consensus(jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(x_node), [2.0, 3.0, 8.0])
    np.testing.assert_allclose(np.asarray(xs_new), [2.0, 3.0, 3.0, 8.0, 2.0])


def test_coverage_reported():
    rng = np.random.default_rng(2)
    S, N = 2000, 2000
    node = rng.integers(0, N, S)  # no locality at all
    bc = build_banded_consensus(node, N, tile=128, window=128)
    assert bc.coverage < 0.5  # poor locality detected
    # correctness still holds via the oob fallback
    xs = rng.normal(size=S).astype(np.float32)
    xs_new, x_node = bc.consensus(jnp.asarray(xs))
    xs_ref, x_ref = plain(node, xs, N)
    np.testing.assert_allclose(np.asarray(x_node), x_ref, atol=1e-4)
