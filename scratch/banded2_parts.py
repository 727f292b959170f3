"""Piecewise timing of the banded2 consensus components."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import jax.lax as lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import synthetic_path_index

N = 1_000_000
pidx = synthetic_path_index(N, 16, 250_000, seed=0)
S = pidx.total_steps
step_node = pidx.step_node_idx
_LANE = 128
T = 256
n_tiles = -(-S // T)
S_pad = n_tiles * T

node_pad = np.full(S_pad, -1, dtype=np.int64)
node_pad[:S] = step_node
tiles = node_pad.reshape(n_tiles, T)
live_t = tiles >= 0
big = np.where(live_t, tiles, np.iinfo(np.int64).max)
mins = np.where(big.min(axis=1) == np.iinfo(np.int64).max, 0, big.min(axis=1))
spans = np.maximum(np.where(live_t, tiles, -1).max(axis=1) - mins + 1, 1)
window = int(np.percentile(spans, 99.0)) + 1
W = max(-(-int(window) // _LANE) * _LANE, _LANE)
Wh = W // _LANE
bases = np.clip(mins, 0, max(N - W, 0)).astype(np.int32)
lidx = tiles - bases[:, None]
in_band = live_t & (lidx >= 0) & (lidx < W)
lidx = np.where(in_band, lidx, -1).astype(np.int32)

lidx_j = jnp.asarray(lidx)
bases_j = jnp.asarray(bases)
print(f"g={n_tiles} T={T} W={W} Wh={Wh}", flush=True)

scatter_dnums = lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,),
)
gather_dnums = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
)


def fwd_dot(xs, lidx_a):
    xs_t = jnp.zeros(S_pad, jnp.float32).at[:S].set(xs).reshape(n_tiles, T)
    hi_i = lidx_a >> 7
    lo_i = lidx_a & (_LANE - 1)
    iota_hi = lax.broadcasted_iota(jnp.int32, (n_tiles, Wh, T), 1)
    iota_lo = lax.broadcasted_iota(jnp.int32, (n_tiles, T, _LANE), 2)
    oh_lo_b = ((lo_i[:, :, None] == iota_lo) & (lidx_a[:, :, None] >= 0)).astype(jnp.bfloat16)
    sel_hi = hi_i[:, None, :] == iota_hi
    a = jnp.where(sel_hi, xs_t[:, None, :], 0.0)
    a_h = a.astype(jnp.bfloat16)
    a_l = (a - a_h.astype(jnp.float32)).astype(jnp.bfloat16)
    lhs = jnp.concatenate([a_h, a_l], axis=1)
    prod = lax.dot_general(
        lhs, oh_lo_b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    wsum = (prod[:, :Wh, :] + prod[:, Wh:, :]).reshape(n_tiles, W)
    return wsum


def fwd_dot_f32(xs, lidx_a):
    """f32 HIGHEST variant, no manual split."""
    xs_t = jnp.zeros(S_pad, jnp.float32).at[:S].set(xs).reshape(n_tiles, T)
    hi_i = lidx_a >> 7
    lo_i = lidx_a & (_LANE - 1)
    iota_hi = lax.broadcasted_iota(jnp.int32, (n_tiles, Wh, T), 1)
    iota_lo = lax.broadcasted_iota(jnp.int32, (n_tiles, T, _LANE), 2)
    oh_lo = ((lo_i[:, :, None] == iota_lo) & (lidx_a[:, :, None] >= 0)).astype(jnp.float32)
    sel_hi = hi_i[:, None, :] == iota_hi
    a = jnp.where(sel_hi, xs_t[:, None, :], 0.0)
    prod = lax.dot_general(
        a, oh_lo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    return prod.reshape(n_tiles, W)


def row_scatter(wsum, bases_a):
    idx = bases_a[:, None].astype(jnp.int32)
    return lax.scatter_add(
        jnp.zeros(N + W, jnp.float32), idx, wsum, scatter_dnums,
        indices_are_sorted=False, unique_indices=False,
    )


def row_gather(x_node_ext, bases_a):
    idx = bases_a[:, None].astype(jnp.int32)
    return lax.gather(x_node_ext, idx, gather_dnums, slice_sizes=(W,))


def bwd_dot(xwin, lidx_a):
    hi_i = lidx_a >> 7
    lo_i = lidx_a & (_LANE - 1)
    iota_hi = lax.broadcasted_iota(jnp.int32, (n_tiles, Wh, T), 1)
    iota_lo = lax.broadcasted_iota(jnp.int32, (n_tiles, T, _LANE), 2)
    oh_lo_b = ((lo_i[:, :, None] == iota_lo) & (lidx_a[:, :, None] >= 0)).astype(jnp.bfloat16)
    sel_hi = hi_i[:, None, :] == iota_hi
    xw = xwin.reshape(n_tiles, Wh, _LANE)
    w_h = xw.astype(jnp.bfloat16)
    w_l = (xw - w_h.astype(jnp.float32)).astype(jnp.bfloat16)
    lhs2 = jnp.concatenate([w_h, w_l], axis=1)
    e = lax.dot_general(
        lhs2, oh_lo_b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    e = e[:, :Wh, :] + e[:, Wh:, :]
    return jnp.sum(jnp.where(sel_hi, e, 0.0), axis=1).reshape(S_pad)[:S]


def chain(body, *static_args):
    def run(x, n, *a):
        def step(i, x):
            return body(x, *a) * 1.0000001
        return lax.fori_loop(0, n, step, x)
    return jax.jit(run, static_argnums=(1,))


def slope(fn, x0, arrays, n1=4, n2=20, reps=3):
    f1 = lambda: np.asarray(jax.device_get(fn(x0, n1, *arrays).reshape(-1)[:8]))
    f2 = lambda: np.asarray(jax.device_get(fn(x0, n2, *arrays).reshape(-1)[:8]))
    f1(); f2()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); f1(); t1 = time.perf_counter(); f2(); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


rng = np.random.default_rng(0)
xs0 = jnp.asarray(rng.random(S).astype(np.float32) * 1e6)
wsum0 = jnp.asarray(rng.random((n_tiles, W)).astype(np.float32))
xne0 = jnp.asarray(rng.random(N + W).astype(np.float32))
xwin0 = jnp.asarray(rng.random((n_tiles, W)).astype(np.float32))

# chain bodies must be shape-stable; feed a cheap slice of the output back
t_fwd = slope(chain(lambda xs, l: fwd_dot(xs, l)[:, :T].reshape(S_pad)[:S]), xs0, (lidx_j,))
print(f"fwd dot (bf16 split):   {t_fwd*1e3:7.2f} ms", flush=True)
t_fwd32 = slope(chain(lambda xs, l: fwd_dot_f32(xs, l)[:, :T].reshape(S_pad)[:S]), xs0, (lidx_j,))
print(f"fwd dot (f32 HIGHEST):  {t_fwd32*1e3:7.2f} ms", flush=True)
t_sc = slope(chain(lambda w, b: w * 1.0 + row_scatter(w, b)[:128].sum() * 1e-20), wsum0, (bases_j,))
print(f"row scatter [g,{W}]:    {t_sc*1e3:7.2f} ms", flush=True)
t_g = slope(chain(lambda x, b: x + row_gather(x, b).sum() * 1e-20), xne0, (bases_j,), n1=4, n2=20)
print(f"row gather  [g,{W}]:    {t_g*1e3:7.2f} ms", flush=True)
t_bwd = slope(chain(lambda w, l: w + bwd_dot(w, l)[:128].sum() * 1e-20), xwin0, (lidx_j,))
print(f"bwd dot (bf16 split):   {t_bwd*1e3:7.2f} ms", flush=True)
