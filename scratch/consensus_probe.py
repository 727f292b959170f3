"""Probe: consensus write-back gather locality.

Current gather-sum consensus (ops/node_sum.py) writes back per-step
means via xn_sorted[slot] where slot = degree-sorted node position per
step — a RANDOM [S] gather (~16.7 ns/row measured).  Hypothesis: going
through original node order first (one random [N] permute) makes the
[S] write-back gather NEAR-MONOTONE (~4.4 ns/row) because step->node is
path-local after any reasonable sort.

Slope timing (two chain lengths) per repo protocol: the axon tunnel
adds 150-400 ms variable dispatch latency; only slopes are trustworthy.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import synthetic_path_index
from gfasort_tpu.ops.node_sum import build_gather_consensus

N = 1_000_000
pidx = synthetic_path_index(N, 16, 250_000, seed=0)
S = pidx.total_steps
gc = build_gather_consensus(pidx.step_node_idx, N, np.float32)

step_node = jnp.asarray(pidx.step_node_idx.astype(np.int32))

n_classes = gc.n_classes


def variant_a(xs, *a):
    """Current: class sums -> xn_sorted -> random [S] gather."""
    return gc.fn(xs, *a)[0]


def variant_b(xs, *a, sn):
    """Class sums -> permute [NL]->node order -> near-monotone [S] gather."""
    idxs = a[:n_classes]
    inv = a[n_classes + 1]
    pos_c = a[n_classes + 2]
    x_ext = jnp.concatenate([xs, jnp.zeros(1, xs.dtype)])
    parts = [x_ext[ix].sum(axis=1) for ix in idxs]
    xn_sorted = jnp.concatenate(parts) * inv
    xn_node = xn_sorted[pos_c]          # [N] random permute
    return xn_node[sn]                   # [S] near-monotone gather


def variant_sum_only(xs, *a):
    """Class sums only (no write-back) — isolates the two shares."""
    idxs = a[:n_classes]
    inv = a[n_classes + 1]
    x_ext = jnp.concatenate([xs, jnp.zeros(1, xs.dtype)])
    parts = [x_ext[ix].sum(axis=1) for ix in idxs]
    xn = jnp.concatenate(parts) * inv
    # cheap reduction back to [S] shape without a gather: broadcast sum
    return xs + xn.sum() * 0


def chain(body, extra=()):
    def run(xs, n, *a):
        def step(i, xs):
            return body(xs, *a) * 1.0000001
        return jax.lax.fori_loop(0, n, step, xs)
    return jax.jit(run, static_argnums=(1,))


def slope(fn, xs0, arrays, n1=8, n2=40, reps=3):
    f1 = lambda: np.asarray(jax.device_get(fn(xs0, n1, *arrays)[:8]))
    f2 = lambda: np.asarray(jax.device_get(fn(xs0, n2, *arrays)[:8]))
    f1(); f2()  # compile both
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); f1(); t1 = time.perf_counter(); f2(); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


xs0 = jnp.asarray(np.random.default_rng(0).random(S).astype(np.float32))

fa = chain(variant_a)
fb = chain(lambda xs, *a: variant_b(xs, *a, sn=step_node))
fs = chain(variant_sum_only)

ta = slope(fa, xs0, gc.arrays)
tb = slope(fb, xs0, gc.arrays)
ts = slope(fs, xs0, gc.arrays)
print(f"S={S} N={N} classes={n_classes} padded={gc.padded_rows}")
print(f"variant A (current, random [S] write-back): {ta*1e3:.2f} ms/consensus")
print(f"variant B (node-order, monotone write-back): {tb*1e3:.2f} ms/consensus")
print(f"class sums only:                             {ts*1e3:.2f} ms/consensus")
