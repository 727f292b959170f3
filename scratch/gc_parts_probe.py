#!/usr/bin/env python
"""Where does the grid consensus's ~24 ms (R=1, S=4M) actually go?

Parts timed by slope, each built from the SAME geometry/arrays as
production (T=256):
  1. one-hot build only (sel_hi, oh_lo from lidx)
  2. fwd dot only (a = where(sel_hi, xs) -> dot -> wsum)
  3. fwd complete (dot + overlap-add scan + oob)
  4. bwd fetch scan only (x_ext -> xwin)
  5. bwd complete (fetch + dot + reduce + oob)
  6. full fn (production)

Round-3 finding to beat: total cost is NOT the MXU dots (precision
HIGH saved only 2%); candidates are the [g,Wh,T]-sized masked operand
materialization, the [g,W] window buffers, and the per-segment
dynamic slices (~7 us each).

r4 NOTE: parts 1-2 ("one-hot build", "fwd dot") reimplement the OLD
128-lane one-hot locally and no longer match production (which uses
the rows-aware 64-lane split + placement-dot merge, 12.5 ms total —
scratch/gc_dot_probe.py has the lane A/B).  The "fwd full"/"bwd
full"/"fn" rows call production code and stay meaningful."""
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
print(f"W={gcx.window} D={gcx.stride} segs={gcx.n_segments}", flush=True)

rng = np.random.default_rng(0)
xs0 = jnp.asarray(rng.random(S, dtype=np.float32) * 1e5)

_LANE = 128
T = gcx.tile
W = gcx.window
Wh = W // _LANE
seg_tiles = 32
n_seg = gcx.n_segments
g_pad = n_seg * seg_tiles
S_pad = g_pad * T
HIGH = jax.lax.Precision.HIGHEST
lidx_a, anchors_a = gcx.arrays[0], gcx.arrays[1]


def one_hots(lidx_a):
    lidx_p = jnp.full((g_pad, T), -1, jnp.int32).at[: lidx_a.shape[0]].set(lidx_a)
    hi_i = lidx_p >> 7
    lo_i = lidx_p & (_LANE - 1)
    iota_hi = lax.broadcasted_iota(jnp.int32, (g_pad, Wh, T), 1)
    iota_lo = lax.broadcasted_iota(jnp.int32, (g_pad, T, _LANE), 2)
    sel_hi = hi_i[:, None, :] == iota_hi
    oh_lo = ((lo_i[:, :, None] == iota_lo) & (lidx_p[:, :, None] >= 0)).astype(
        jnp.float32
    )
    return sel_hi, oh_lo


def part_onehot(xs, lidx_a, anchors_a):
    sel_hi, oh_lo = one_hots(lidx_a)
    return xs + (sel_hi.sum(dtype=jnp.float32) + oh_lo.sum()) * jnp.float32(1e-30)


def part_fwd_dot(xs, lidx_a, anchors_a):
    sel_hi, oh_lo = one_hots(lidx_a)
    xs_pad = jnp.zeros((1, S_pad + 1), jnp.float32).at[:, :S].set(xs[None])
    xs_t = xs_pad[:, :S_pad].reshape(1, g_pad, T)
    a = jnp.where(sel_hi[None], xs_t[:, :, None, :], 0.0)
    wsum = lax.dot_general(
        a, oh_lo, dimension_numbers=(((3,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32, precision=HIGH,
    )
    return xs + wsum[:, :, 0, 0].sum() * jnp.float32(1e-30)


def part_fwd_full(xs, *arrays):
    s = gcx.fwd(xs, *arrays[:4])
    return xs + s[:8].sum() * jnp.float32(1e-30)


def part_bwd_full(xs, *arrays):
    xn = jnp.zeros(N, jnp.float32) + xs[:1] * 0
    out = gcx.bwd(xn, xs, *arrays[:4])
    return out * 1.0000001


def part_full(xs, *arrays):
    return gcx.fn(xs, *arrays)[0] * 1.0000001


def chain(body, n_extra_args):
    @jax.jit
    def run(x, n, *a):
        def step(i, x):
            return body(x, *a)
        return lax.fori_loop(0, n, step, x)
    return run


def slope(body, arrays, n1=4, n2=16, reps=3):
    f = chain(body, len(arrays))
    def go(n):
        return np.asarray(jax.device_get(f(xs0, jnp.int32(n), *arrays)[:8]))
    go(n1); go(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


for name, body, arrays in (
    ("one-hot build", part_onehot, (lidx_a, anchors_a)),
    ("fwd dot", part_fwd_dot, (lidx_a, anchors_a)),
    ("fwd full", part_fwd_full, gcx.arrays),
    ("bwd full", part_bwd_full, gcx.arrays),
    ("fn (production)", part_full, gcx.arrays),
):
    t = slope(body, arrays)
    print(f"{name:16s}: {t*1e3:6.2f} ms", flush=True)
