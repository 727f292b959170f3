"""Probe: reformulated banded consensus (bf16-split MXU one-hot).

Round-1 banded (ops/consensus.py) measured 73 ms on the bench workload
(window ~4.4x tile): the [g,T,128] f32 intermediates (`a`, `b1`) cost
~8 GB of HBM traffic and XLA relayouts the f32 one-hots for the dots.

Reformulation measured here:
  forward:  lhs = split_bf16(oh_hi * xs)  [g, 2Wh, T]   (small)
            rhs = oh_lo bf16              [g, T, 128]   (S*128*2B = 1 GB)
            wsum = dot(lhs, rhs)          [g, 2Wh, 128] -> combine halves
  backward: lhs = split_bf16(xwin)        [g, 2Wh, 128] (tiny)
            rhs = oh_lo bf16              (same array)
            e    = dot contracting lo     [g, 2Wh, T]
            xs_new = masked reduce over hi (fused elementwise)

bf16 x bf16 products accumulate exactly in the MXU f32 accumulator and
one-hot entries are exactly 1.0, so split-bf16 == f32 HIGHEST precision.

Slope timing per repo protocol (axon tunnel: only slopes trustworthy).
"""
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
from gfasort_tpu.ops.node_sum import build_gather_consensus
from gfasort_tpu.ops.consensus import build_banded_consensus

N = 1_000_000
pidx = synthetic_path_index(N, 16, 250_000, seed=0)
S = pidx.total_steps
step_node = pidx.step_node_idx

_LANE = 128


def build_banded2(step_node, n_nodes, tile=256, window=None):
    S = int(step_node.shape[0])
    N = int(n_nodes)
    T = tile
    n_tiles = -(-S // T)
    S_pad = n_tiles * T

    node_pad = np.full(S_pad, -1, dtype=np.int64)
    node_pad[:S] = step_node
    tiles = node_pad.reshape(n_tiles, T)

    live_t = tiles >= 0
    big = np.where(live_t, tiles, np.iinfo(np.int64).max)
    mins = big.min(axis=1)
    mins = np.where(mins == np.iinfo(np.int64).max, 0, mins)
    small = np.where(live_t, tiles, -1)
    maxs = small.max(axis=1)
    spans = np.maximum(maxs - mins + 1, 1)
    if window is None:
        window = int(np.percentile(spans, 99.0)) + 1
    W = max(-(-int(window) // _LANE) * _LANE, _LANE)
    Wh = W // _LANE

    bases = np.clip(mins, 0, max(N - W, 0)).astype(np.int32)
    lidx = tiles - bases[:, None]
    in_band = live_t & (lidx >= 0) & (lidx < W)
    lidx = np.where(in_band, lidx, -1).astype(np.int32)
    coverage = float(in_band.sum()) / max(S, 1)

    oob_mask = (~in_band) & live_t
    oob_flat = np.flatnonzero(oob_mask.reshape(-1))
    oob_steps_j = jnp.asarray(oob_flat.astype(np.int32))
    oob_nodes_j = jnp.asarray(node_pad[oob_flat].astype(np.int32))
    n_oob = len(oob_flat)

    cnt = np.bincount(step_node.astype(np.int64), minlength=N).astype(np.float64)
    inv_cnt_np = (1.0 / np.maximum(cnt, 1.0)).astype(np.float32)
    live_j = jnp.asarray(node_pad >= 0)

    lidx_j = jnp.asarray(lidx)
    bases_j = jnp.asarray(bases)
    inv_cnt_j = jnp.asarray(inv_cnt_np)

    scatter_dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    gather_dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def split_bf16(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def fn(xs, lidx_a, bases_a, inv_cnt_a):
        dt = xs.dtype
        xs_pad = jnp.zeros(S_pad, jnp.float32).at[:S].set(xs.astype(jnp.float32))
        xs_t = xs_pad.reshape(n_tiles, T)

        hi_i = lidx_a >> 7                           # [g, T], -1 for dead
        lo_i = lidx_a & (_LANE - 1)
        iota_hi = lax.broadcasted_iota(jnp.int32, (n_tiles, Wh, T), 1)
        iota_lo = lax.broadcasted_iota(jnp.int32, (n_tiles, T, _LANE), 2)
        oh_lo = (lo_i[:, :, None] == iota_lo) & (lidx_a[:, :, None] >= 0)
        oh_lo_b = oh_lo.astype(jnp.bfloat16)         # [g, T, LANE] exact

        # forward: wsum[g, hi, lo] = sum_t [hi_i[t]==hi] * xs[t] * oh_lo
        sel_hi = (hi_i[:, None, :] == iota_hi)       # [g, Wh, T]
        a = jnp.where(sel_hi, xs_t[:, None, :], 0.0)  # [g, Wh, T] f32
        a_h, a_l = split_bf16(a)
        lhs = jnp.concatenate([a_h, a_l], axis=1)     # [g, 2Wh, T] bf16
        prod = lax.dot_general(
            lhs, oh_lo_b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # [g, 2Wh, 128]
        wsum = (prod[:, :Wh, :] + prod[:, Wh:, :]).reshape(n_tiles, W)

        npad = N + W
        idx = bases_a[:, None].astype(jnp.int32)
        ssum = lax.scatter_add(
            jnp.zeros(npad, jnp.float32), idx, wsum,
            scatter_dnums, indices_are_sorted=False, unique_indices=False,
        )
        if n_oob:
            ssum = ssum.at[oob_nodes_j].add(xs_pad[oob_steps_j])
        x_node = ssum[:N] * inv_cnt_a

        # backward: xs_new[t] = xwin[g, hi_i[t], lo_i[t]]
        xwin = lax.gather(
            jnp.concatenate([x_node, jnp.zeros(W, x_node.dtype)]),
            idx, gather_dnums, slice_sizes=(W,),
        ).reshape(n_tiles, Wh, _LANE)
        w_h, w_l = split_bf16(xwin)
        lhs2 = jnp.concatenate([w_h, w_l], axis=1)    # [g, 2Wh, 128]
        e = lax.dot_general(
            lhs2, oh_lo_b,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # [g, 2Wh, T]
        e = e[:, :Wh, :] + e[:, Wh:, :]               # [g, Wh, T]
        xs_new = jnp.sum(jnp.where(sel_hi, e, 0.0), axis=1).reshape(S_pad)
        if n_oob:
            xs_new = xs_new.at[oob_steps_j].set(x_node[oob_nodes_j])
        xs_new = jnp.where(live_j, xs_new, xs_pad)
        return xs_new[:S].astype(dt), x_node.astype(dt)

    def consensus(xs):
        return fn(xs, lidx_j, bases_j, inv_cnt_j)

    return consensus, (lidx_j, bases_j, inv_cnt_j), coverage, W


def chain(body):
    def run(xs, n, *a):
        def step(i, xs):
            return body(xs, *a) * 1.0000001
        return lax.fori_loop(0, n, step, xs)
    return jax.jit(run, static_argnums=(1,))


def slope(fn, xs0, arrays, n1=8, n2=40, reps=3):
    f1 = lambda: np.asarray(jax.device_get(fn(xs0, n1, *arrays)[:8]))
    f2 = lambda: np.asarray(jax.device_get(fn(xs0, n2, *arrays)[:8]))
    f1(); f2()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); f1(); t1 = time.perf_counter(); f2(); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


xs0_np = np.random.default_rng(0).random(S).astype(np.float32) * 1e6
xs0 = jnp.asarray(xs0_np)

# correctness vs scatter-mean
cnt = np.bincount(step_node, minlength=N).astype(np.float64)
ssum = np.zeros(N)
np.add.at(ssum, step_node, xs0_np.astype(np.float64))
x_node_ref = ssum / np.maximum(cnt, 1)
xs_ref = x_node_ref[step_node]

gc = build_gather_consensus(step_node, N, np.float32)

for T in (128, 256, 512):
    cons2, arrs2, cov, W = build_banded2(step_node, N, tile=T)
    xs_new, x_node = jax.jit(cons2)(xs0)
    err = float(np.abs(np.asarray(xs_new) - xs_ref).max() / np.abs(xs_ref).max())
    t2 = slope(chain(lambda xs, *a: cons2(xs)[0]), xs0, ())
    print(f"banded2 T={T:4d} W={W:5d} cov={cov:.4f} relerr={err:.2e}: {t2*1e3:.2f} ms")

b1 = build_banded_consensus(step_node, N, tile=256)
t1 = slope(chain(lambda xs, *a: b1.fn(xs, *a)[0]), xs0, b1.arrays)
print(f"banded1 T=256 W={b1.window} cov={b1.coverage:.4f}: {t1*1e3:.2f} ms")

ta = slope(chain(lambda xs, *a: gc.fn(xs, *a)[0]), xs0, gc.arrays)
print(f"gather-sum (current): {ta*1e3:.2f} ms")
