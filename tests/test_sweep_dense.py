"""Equivalence tests for the fused dense-bucket Pallas kernel
(ops/sweep_dense.py) against the XLA sweep path it replaces."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gfasort_tpu.ops.sweep_common import INACTIVE  # noqa: E402
from gfasort_tpu.ops.sweep_dense import build_dense_apply  # noqa: E402


def _xla_reference(xs, pos, sidx, eta, n_dense, S):
    """The ops/sweep.py half() math for dense buckets, flat rolls."""
    iota = np.arange(S)
    dsum = np.zeros(S, np.float32)
    csum = np.zeros(S, np.float32)
    for ki in range(n_dense):
        k = ki + 1
        for shift, w_mine, w_theirs in (
            (-k, sidx == ki, np.roll(sidx, -k) == ~ki),
            (+k, sidx == ~ki, np.roll(sidx, +k) == ki),
        ):
            xs_o = np.roll(xs, shift)
            pos_o = np.roll(pos, shift)
            guard = iota < S + shift if shift < 0 else iota >= shift
            w_bool = w_mine | (w_theirs & guard)
            d = np.abs(pos - pos_o)
            valid = w_bool & (d != 0)
            w = valid.astype(np.float32)
            safe = np.where(valid, d, np.float32(1.0))
            mu = np.minimum(eta / safe, np.float32(1.0))
            dx = xs - xs_o
            dx = np.where(dx == 0, np.float32(1e-9), dx)
            mag = np.abs(dx)
            r_x = (mu * (mag - safe) / np.float32(2.0) / mag) * dx
            dsum += -w * r_x
            csum += w
    return dsum, csum


@pytest.mark.parametrize("S", [7000, 128 * 512 + 1, 128 * 512 * 2])
def test_dense_apply_matches_xla_reference(S):
    rng = np.random.default_rng(S)
    n_dense = 8
    xs = rng.standard_normal(S).astype(np.float32) * 100
    pos = np.cumsum(rng.integers(0, 4, S)).astype(np.float32)
    # random choices: dense buckets both signs, some INACTIVE, some
    # large-bucket indices (must be ignored by the kernel)
    choice = rng.integers(-9, 12, S).astype(np.int32)
    sidx = np.where(rng.random(S) < 0.3, INACTIVE, choice)
    eta = np.float32(3.7)

    apply = build_dense_apply(n_dense, S, jnp.float32, interpret=True)
    dsum, csum = apply(jnp.asarray(xs), jnp.asarray(pos),
                       jnp.asarray(sidx), eta)
    # The np.roll reference wraps at the array ends while the kernel
    # reads zero padding there; with unconstrained random choices the
    # first/last n_dense elements may legitimately differ (both are
    # garbage the sampler contract forbids).  Compare the interior;
    # edge parity under the sampler contract is the next test.
    want_d, want_c = _xla_reference(xs, pos, sidx, eta, n_dense, S)
    got_d = np.asarray(dsum)
    got_c = np.asarray(csum)
    # interior (away from wrap effects) must match tightly
    sl = slice(8, S - 8)
    np.testing.assert_allclose(got_c[sl], want_c[sl], atol=0)
    np.testing.assert_allclose(got_d[sl], want_d[sl], rtol=2e-6, atol=1e-5)


def _clean_edge_sidx(rng, S, n_dense):
    """Choices that never cross the array ends (the sampler contract)."""
    choice = rng.integers(-(n_dense + 1), n_dense + 4, S).astype(np.int32)
    sidx = np.where(rng.random(S) < 0.3, INACTIVE, choice)
    iota = np.arange(S)
    for k in range(1, n_dense + 1):
        sidx = np.where((sidx == k - 1) & (iota + k >= S), INACTIVE, sidx)
        sidx = np.where((sidx == ~(k - 1)) & (iota - k < 0), INACTIVE, sidx)
    return sidx


def test_dense_apply_edges_with_sampler_contract():
    """With in-range choices (what the sampler guarantees), the kernel
    matches the XLA reference everywhere including the array ends."""
    S = 5000
    n_dense = 8
    rng = np.random.default_rng(0)
    xs = rng.standard_normal(S).astype(np.float32)
    pos = np.cumsum(rng.integers(1, 4, S)).astype(np.float32)
    sidx = _clean_edge_sidx(rng, S, n_dense)
    eta = np.float32(1.3)
    apply = build_dense_apply(n_dense, S, jnp.float32, interpret=True)
    dsum, csum = apply(jnp.asarray(xs), jnp.asarray(pos),
                       jnp.asarray(sidx), eta)
    want_d, want_c = _xla_reference(xs, pos, sidx, eta, n_dense, S)
    np.testing.assert_allclose(np.asarray(csum), want_c, atol=0)
    np.testing.assert_allclose(np.asarray(dsum), want_d, rtol=2e-6, atol=1e-5)


def test_sweep_engine_same_result_with_kernel(monkeypatch):
    """End-to-end: the sweep engine produces (near-)identical positions
    with the kernel forced on vs off."""
    from gfasort_tpu.bench_util import synthetic_path_index, bench_params
    from gfasort_tpu.ops.sweep import path_linear_sgd_sweep

    pidx = synthetic_path_index(30_000, 3, 50_000, seed=1)
    params = bench_params(pidx, batch=pidx.total_steps, rounds=3)

    monkeypatch.setenv("GFASORT_DENSE_KERNEL", "xla")
    x_xla = path_linear_sgd_sweep(None, params, pidx, consensus_every=4)
    monkeypatch.setenv("GFASORT_DENSE_KERNEL", "pallas")
    x_pal = path_linear_sgd_sweep(None, params, pidx, consensus_every=4)

    assert np.isfinite(x_pal).all()
    np.testing.assert_allclose(x_pal, x_xla, rtol=1e-4, atol=1e-3)


def test_nd_dense_apply_matches_sweep_reference():
    """The nD dense apply (jnp reference path) matches a direct numpy
    transcription of ops/sweep_nd.py's half() for dense buckets."""
    from gfasort_tpu.ops.sweep_dense import build_dense_apply_nd

    S, D, n_dense = 4000, 2, 8
    rng = np.random.default_rng(3)
    my_pos = np.cumsum(rng.integers(1, 5, S)).astype(np.float32)
    my_c = [rng.standard_normal(S).astype(np.float32) * 50 for _ in range(D)]
    sidx = _clean_edge_sidx(rng, S, n_dense)
    eta = np.float32(2.1)

    apply = build_dense_apply_nd(n_dense, S, D, jnp.float32, interpret=True)
    acc, wacc = apply(jnp.asarray(my_pos), jnp.asarray(sidx),
                      [jnp.asarray(c) for c in my_c], eta)

    iota = np.arange(S)
    want_acc = [np.zeros(S, np.float32) for _ in range(D)]
    want_w = np.zeros(S, np.float32)
    for ki in range(n_dense):
        k = ki + 1
        for shift, w_mine, w_theirs in (
            (-k, sidx == ki, np.roll(sidx, -k) == ~ki),
            (+k, sidx == ~ki, np.roll(sidx, +k) == ki),
        ):
            pos_o = np.roll(my_pos, shift)
            c_o = [np.roll(c, shift) for c in my_c]
            guard = iota < S + shift if shift < 0 else iota >= shift
            w_bool = w_mine | (w_theirs & guard)
            d_term = np.abs(my_pos - pos_o)
            valid = (d_term != 0) & w_bool
            w = valid.astype(np.float32)
            safe = np.where(valid, d_term, np.float32(1.0))
            mu = np.minimum(eta / safe, np.float32(1.0))
            deltas = [a - b for a, b in zip(my_c, c_o)]
            mag_sq = sum(dd * dd for dd in deltas)
            zero = mag_sq == 0
            deltas[0] = np.where(zero, np.float32(1e-9), deltas[0])
            mag_sq = np.where(zero, np.float32(1e-18), mag_sq)
            mag = np.sqrt(mag_sq)
            r = np.minimum(mu * (mag - safe) / np.float32(2.0) / mag,
                           np.float32(1e30))
            wr = w * r
            for d in range(D):
                want_acc[d] -= wr * deltas[d]
            want_w += w
    np.testing.assert_allclose(np.asarray(wacc), want_w, atol=0)
    for d in range(D):
        np.testing.assert_allclose(np.asarray(acc[d]), want_acc[d],
                                   rtol=2e-5, atol=1e-4)


def test_nd_sweep_engine_same_result_with_kernel(monkeypatch):
    """End-to-end 2D layout: same coordinates with the dense kernel
    forced on vs off."""
    from gfasort_tpu.bench_util import synthetic_path_index
    from gfasort_tpu.ops.sweep_nd import path_linear_sgd_layout_sweep
    from gfasort_tpu.params import LayoutSGDParams
    from dataclasses import replace

    pidx = synthetic_path_index(20_000, 3, 30_000, seed=2)
    lp = replace(
        LayoutSGDParams().derive_from_graph(pidx, 2),
        dtype="float32", pow_mode="fast", iter_max=2,
    )
    monkeypatch.setenv("GFASORT_DENSE_KERNEL", "xla")
    l_xla = path_linear_sgd_layout_sweep(None, lp, pidx)
    monkeypatch.setenv("GFASORT_DENSE_KERNEL", "pallas")
    l_pal = path_linear_sgd_layout_sweep(None, lp, pidx)
    assert np.isfinite(l_pal.coords).all()
    # the kernel accumulates buckets in k-ascending order while the XLA
    # loop follows phase order: f32 reassociation drifts a handful of
    # coords by ~1e-5 relative over the iterations (coord scale ~1e4)
    np.testing.assert_allclose(l_pal.coords, l_xla.coords,
                               rtol=1e-4, atol=0.2)


def test_bucket_apply_mid_offsets():
    """Generalized bucket kernel path (jnp reference): mid offsets
    (8 < k <= 8192) with phase-style indices match the XLA-roll math."""
    from gfasort_tpu.ops.sweep_dense import build_bucket_apply

    S = 70_000
    buckets = [(1, 0), (5, 4), (181, 9), (1449, 11), (8192, 13)]
    rng = np.random.default_rng(7)
    xs = rng.standard_normal(S).astype(np.float32) * 10
    pos = np.cumsum(rng.integers(1, 4, S)).astype(np.float32)
    kis = [ki for _, ki in buckets]
    raw = rng.choice(kis + [~ki for ki in kis] + [INACTIVE, 3, ~2], S)
    sidx = raw.astype(np.int32)
    # sampler contract: no out-of-range choices
    iota = np.arange(S)
    for k, ki in buckets:
        sidx = np.where((sidx == ki) & (iota + k >= S), INACTIVE, sidx)
        sidx = np.where((sidx == ~ki) & (iota - k < 0), INACTIVE, sidx)
    eta = np.float32(0.9)

    apply = build_bucket_apply(buckets, S, jnp.float32, interpret=True)
    dsum, csum = apply(jnp.asarray(xs), jnp.asarray(pos),
                       jnp.asarray(sidx), eta)

    want_d = np.zeros(S, np.float32)
    want_c = np.zeros(S, np.float32)
    for k, ki in buckets:
        for shift, w_mine, w_theirs in (
            (-k, sidx == ki, np.roll(sidx, -k) == ~ki),
            (+k, sidx == ~ki, np.roll(sidx, +k) == ki),
        ):
            xs_o = np.roll(xs, shift)
            pos_o = np.roll(pos, shift)
            guard = iota < S + shift if shift < 0 else iota >= shift
            w_bool = w_mine | (w_theirs & guard)
            d = np.abs(pos - pos_o)
            valid = w_bool & (d != 0)
            w = valid.astype(np.float32)
            safe = np.where(valid, d, np.float32(1.0))
            mu = np.minimum(eta / safe, np.float32(1.0))
            dx = xs - xs_o
            dx = np.where(dx == 0, np.float32(1e-9), dx)
            mag = np.abs(dx)
            want_d += -w * ((mu * (mag - safe) / np.float32(2.0) / mag) * dx)
            want_c += w
    np.testing.assert_allclose(np.asarray(csum), want_c, atol=0)
    np.testing.assert_allclose(np.asarray(dsum), want_d, rtol=2e-5, atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real (non-interpret) Mosaic kernel needs TPU hardware",
)
@pytest.mark.parametrize("case", ["dense", "mid", "nd2", "mid_p4",
                                  "nd2_p4"])
def test_real_kernel_matches_interpret_on_tpu(case):
    """ADVICE r2: the Mosaic kernel body (DMA windows, transpose,
    lane rolls, sublane concat views) is otherwise never exercised by
    CI — run the REAL kernel against the pure-jnp interpret path on
    random inputs.  (Run manually on the TPU terminal:
    ``python -m pytest tests/test_sweep_dense.py -k real_kernel``
    WITHOUT the conftest's cpu force, e.g. from the repo root with
    ``GFASORT_TEST_TPU=1``.)"""
    from gfasort_tpu.ops.sweep_dense import (
        build_bucket_apply,
        build_dense_apply_nd,
    )

    S = 128 * 512 + 7
    rng = np.random.default_rng(42)
    pos = np.cumsum(rng.integers(1, 4, S)).astype(np.float32)
    iota = np.arange(S)
    if case == "dense":
        buckets = [(k, k - 1) for k in range(1, 9)]
    else:
        buckets = [(k, i) for i, k in
                   enumerate([1, 2, 3, 4, 5, 6, 7, 8, 16, 181, 1024])]
    kis = [ki for _, ki in buckets]

    def draw_sidx():
        raw = rng.choice(kis + [~ki for ki in kis] + [int(INACTIVE)], S)
        s = raw.astype(np.int32)
        for k, ki in buckets:
            s = np.where((s == ki) & (iota + k >= S), INACTIVE, s)
            s = np.where((s == ~ki) & (iota - k < 0), INACTIVE, s)
        return s

    P = 4 if case.endswith("_p4") else 1
    if P == 1:
        sidx = draw_sidx()
    else:
        from gfasort_tpu.ops.sweep_common import pack_choices

        sidx = np.asarray(pack_choices(
            [jnp.asarray(draw_sidx()) for _ in range(P)]
        ))
    eta = np.float32(1.3)

    if case.startswith("nd2"):
        D = 2
        my_pos = pos
        my_c = [jnp.asarray(rng.standard_normal(S).astype(np.float32) * 50)
                for _ in range(D)]
        real = build_dense_apply_nd(8, S, D, jnp.float32, interpret=False,
                                    buckets=buckets, proposals=P)
        ref = build_dense_apply_nd(8, S, D, jnp.float32, interpret=True,
                                   buckets=buckets, proposals=P)
        acc_r, w_r = real(jnp.asarray(my_pos), jnp.asarray(sidx), my_c, eta)
        acc_i, w_i = ref(jnp.asarray(my_pos), jnp.asarray(sidx), my_c, eta)
        np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_i), atol=0)
        for a_r, a_i in zip(acc_r, acc_i):
            np.testing.assert_allclose(
                np.asarray(a_r), np.asarray(a_i), rtol=2e-5, atol=1e-4
            )
        return

    xs = rng.standard_normal(S).astype(np.float32) * 100
    real = build_bucket_apply(buckets, S, jnp.float32, interpret=False,
                              proposals=P)
    ref = build_bucket_apply(buckets, S, jnp.float32, interpret=True,
                             proposals=P)
    d_r, c_r = real(jnp.asarray(xs), jnp.asarray(pos), jnp.asarray(sidx), eta)
    d_i, c_i = ref(jnp.asarray(xs), jnp.asarray(pos), jnp.asarray(sidx), eta)
    np.testing.assert_allclose(np.asarray(c_r), np.asarray(c_i), atol=0)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_i),
                               rtol=2e-5, atol=1e-4)
