#!/usr/bin/env python
"""A/B the grid-consensus one-hot window-reduction dot (the ~6.3 ms
fwd-dot + similar bwd cost that dominates the 19.8 ms R=1 call).

Variants, all computing wsum[g, Wh*, LANE*] from xs [S] and lidx [g, T]:
  base      — production: f32 a + f32 oh_lo, LANE=128, HIGHEST
  high      — precision HIGH instead of HIGHEST
  bf16x2    — xs split x_hi + x_lo (Dekker bf16 split), oh_lo bf16,
              two native bf16 dots accumulated f32 (exact to ~2^-16)
  lane64    — lo factor 64: oh_lo [g,T,64] (half traffic), Wh doubles
              (M=64: 2x MXU utilization)
  lane64+bf16x2 — both

Each also reports max relative error vs the f64 reference window sum.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import jax.lax as lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import synthetic_path_index
from gfasort_tpu.ops.grid_consensus import build_grid_consensus

N = 1_000_000
pidx = synthetic_path_index(N, 16, 250_000, seed=0)
S = pidx.total_steps
gcx = build_grid_consensus(pidx.step_node_idx, N, path_of_step=pidx.step_path)
W, T, n_seg = gcx.window, gcx.tile, gcx.n_segments
SL = 32
g_pad = n_seg * SL
S_pad = g_pad * T
print(f"W={W} T={T} segs={n_seg}", flush=True)

lidx_a = gcx.arrays[0]
rng = np.random.default_rng(0)
xs0 = jnp.asarray(rng.random(S, dtype=np.float32) * 1e5)
HI = jax.lax.Precision.HIGHEST


def pad_tiles(xs):
    xs_pad = jnp.zeros((S_pad + 1,), jnp.float32).at[:S].set(xs)
    return xs_pad[:S_pad].reshape(g_pad, T)


def variant(lane, mode):
    Whv = W // lane
    shift = {128: 7, 64: 6, 32: 5}[lane]

    def f(xs, lidx_a):
        lidx_p = jnp.full((g_pad, T), -1, jnp.int32).at[: lidx_a.shape[0]].set(lidx_a)
        hi_i = lidx_p >> shift
        lo_i = lidx_p & (lane - 1)
        iota_hi = lax.broadcasted_iota(jnp.int32, (g_pad, Whv, T), 1)
        iota_lo = lax.broadcasted_iota(jnp.int32, (g_pad, T, lane), 2)
        sel_hi = hi_i[:, None, :] == iota_hi
        ohb = (lo_i[:, :, None] == iota_lo) & (lidx_p[:, :, None] >= 0)
        xs_t = pad_tiles(xs)
        if mode == "bf16x2":
            oh = ohb.astype(jnp.bfloat16)
            xh = xs_t.astype(jnp.bfloat16)
            xl = (xs_t - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            out = None
            for xpart in (xh, xl):
                a = jnp.where(sel_hi, xpart[:, None, :], jnp.bfloat16(0))
                d = lax.dot_general(
                    a, oh,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                out = d if out is None else out + d
            wsum = out
        else:
            prec = HI if mode == "highest" else jax.lax.Precision.HIGH
            oh = ohb.astype(jnp.float32)
            a = jnp.where(sel_hi, xs_t[:, None, :], 0.0)
            wsum = lax.dot_general(
                a, oh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return wsum  # [g_pad, Whv, lane]

    return f


def chain(f):
    @jax.jit
    def run(x, n, lidx_a):
        def step(i, x):
            w = f(x, lidx_a)
            # full-tensor reduction: forces every output element (a
            # sliced consumer lets XLA DCE the dot almost entirely)
            return x + w.sum(dtype=jnp.float32) * jnp.float32(1e-30)
        return lax.fori_loop(0, n, step, x)
    return run


def slope(f, n1=4, n2=16, reps=3):
    r = chain(f)
    def go(n):
        return np.asarray(jax.device_get(r(xs0, jnp.int32(n), lidx_a)[:8]))
    go(n1); go(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


# f64 reference for error check
def ref_wsum():
    lidx = np.asarray(lidx_a)
    xs_np = np.zeros(S_pad)
    xs_np[:S] = np.asarray(xs0, dtype=np.float64)
    tiles = xs_np.reshape(g_pad, T)
    out = np.zeros((g_pad, W))
    lp = np.full((g_pad, T), -1, np.int64)
    lp[: lidx.shape[0]] = lidx
    gi, ti = np.nonzero(lp >= 0)
    np.add.at(out, (gi, lp[gi, ti]), tiles[gi, ti])
    return out


REF = ref_wsum()

for name, lane, mode in (
    ("base  L128 highest", 128, "highest"),
    ("high  L128 high   ", 128, "high"),
    ("bf16x2 L128       ", 128, "bf16x2"),
    ("lane64 highest    ", 64, "highest"),
    ("lane64 bf16x2     ", 64, "bf16x2"),
    ("lane32 highest    ", 32, "highest"),
):
    f = variant(lane, mode)
    w = np.asarray(jax.device_get(jax.jit(f)(xs0, lidx_a)), dtype=np.float64)
    w = w.reshape(g_pad, W)
    denom = np.maximum(np.abs(REF), 1.0)
    relerr = float(np.max(np.abs(w - REF) / denom))
    t = slope(f)
    print(f"{name}: {t*1e3:6.2f} ms  relerr={relerr:.2e}", flush=True)
