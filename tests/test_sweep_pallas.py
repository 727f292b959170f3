"""Pallas sweep-apply kernel: interpret-mode equivalence vs the XLA
roll formulation (the production engine).  The kernel is experimental —
measured SLOWER than the XLA engine on TPU v5e (see module docstring) —
but kept as the documented starting point for a hand-scheduled round-2
attempt; this test pins its semantics."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from gfasort_tpu.ops.sweep_pallas import (
    INACTIVE,
    build_sweep_apply,
    pad_sidx,
    pad_state,
    pad_static,
)

K_OFFS = np.array([1, 2, 3, 4, 6, 9, 13, 19, 40, 100, 300], np.int32)


def _reference(xs, pos, sidx, rank, cnt, eta, offs):
    """mirror of ops/sweep.py's per-bucket masked update"""
    fdt = jnp.float32
    xs = jnp.asarray(xs); pos = jnp.asarray(pos); sidx = jnp.asarray(sidx)
    rank = jnp.asarray(rank); cnt = jnp.asarray(cnt)
    dsum = jnp.zeros_like(xs)
    csum = jnp.zeros_like(xs)
    for ki in range(len(offs)):
        k = int(offs[ki])

        def half(shift, w_bool):
            pos_o = jnp.roll(pos, shift)
            xs_o = jnp.roll(xs, shift)
            pair_ok = (rank - shift < cnt if shift < 0 else rank >= shift)
            d = jnp.abs(pos - pos_o)
            valid = pair_ok & (d != 0)
            w = jnp.where(valid, w_bool.astype(xs.dtype), fdt(0))
            safe = jnp.where(valid, d, 1.0)
            mu = jnp.minimum(eta / safe, 1.0)
            dx = xs - xs_o
            dx = jnp.where(dx == 0, fdt(1e-9), dx)
            mag = jnp.abs(dx)
            r_x = (mu * (mag - safe) / 2.0 / mag) * dx
            return -w * r_x, w

        d1, w1 = half(-k, (sidx == ki) | (jnp.roll(sidx, -k) == ~ki))
        d2, w2 = half(+k, (sidx == ~ki) | (jnp.roll(sidx, +k) == ki))
        dsum = dsum + d1 + d2
        csum = csum + w1 + w2
    return np.asarray(xs + dsum / jnp.maximum(csum, 1))


@pytest.mark.parametrize("S,cnt1", [(3000, 1800), (1024, 1024), (5000, 100)])
def test_pallas_apply_matches_reference(S, cnt1):
    rng = np.random.default_rng(S)
    K = len(K_OFFS)
    rank = np.concatenate(
        [np.arange(cnt1), np.arange(S - cnt1)]
    ).astype(np.int32)
    cnt = np.concatenate(
        [np.full(cnt1, cnt1), np.full(S - cnt1, S - cnt1)]
    ).astype(np.int32)
    xs = rng.normal(size=S).astype(np.float32) * 100
    pos = np.cumsum(rng.integers(1, 10, S)).astype(np.float32)
    choice = rng.integers(-K, K + 3, size=S)
    sidx = np.where(choice >= K, int(INACTIVE), choice).astype(np.int32)
    eta = np.float32(0.37)

    ref = _reference(xs, pos, sidx, rank, cnt, eta, K_OFFS)

    apply_fn, layout = build_sweep_apply(
        K_OFFS, S, jnp.float32, tile=1024, interpret=True
    )
    pos2 = jnp.asarray(pad_static(pos, layout))
    S_pad = layout["S_pad"]
    rank_pad = np.zeros(S_pad, np.int32); rank_pad[:S] = rank
    cnt_pad = np.zeros(S_pad, np.int32); cnt_pad[:S] = cnt
    out = np.asarray(apply_fn(
        pad_state(jnp.asarray(xs), layout),
        pos2,
        pad_sidx(jnp.asarray(sidx), layout),
        jnp.asarray(rank_pad.reshape(-1, 128)),
        jnp.asarray(cnt_pad.reshape(-1, 128)),
        eta,
    ))[:S]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
