#!/usr/bin/env python
"""Breakdown of the nD layout sweep cost at bench scale (VERDICT r2
weak #6: 2D layout ~86M upd/s vs ~860M for 1D — explain the 10x).

Slope-times on the default accelerator, S=4M / N=1M / D=2:
  1. grid consensus on R=2D rows (per call; amortized /8 sweeps)
  2. one nd sweep, full phase offset set (dense kernel + XLA buckets)
  3. one nd sweep, dense buckets only (kernel only)
  4. one nd sweep, XLA-only (GFASORT_DENSE_KERNEL=xla)
  5. the same three for the 1D sweep body, for the direct comparison

Accounting context: nd streams ~(2+2D) input rows + (D+1) output rows
per bucket pass vs 1D's ~3+2; the nd bench also credits fewer updates
per sweep (frac floor 1/4 vs 0.8 in throughput mode), which is a
BOOKKEEPING factor, not a hardware one.

Usage: python scratch/nd_profile.py  (TPU; ~2 min)
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

from dataclasses import replace

from gfasort_tpu.bench_util import synthetic_path_index
from gfasort_tpu.ops.fastpow import zeta_table
from gfasort_tpu.ops.sweep import offset_set
from gfasort_tpu.ops.sweep_nd import make_nd_sweep_fn
from gfasort_tpu.params import LayoutSGDParams, PathSGDParams

D = 2
pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
S = pidx.total_steps
N = pidx.num_nodes
print(f"device: {jax.devices()[0]}  S={S} N={N} D={D}", flush=True)

lp = LayoutSGDParams().derive_from_graph(pidx, D)
lp = replace(lp, dtype="float32", pow_mode="fast")
zetas = zeta_table(lp.space, lp.space_max, lp.space_quantization_step, lp.theta)

max_jump = max(1, min(int(lp.space), pidx.max_path_step_count - 1))
offs = offset_set(max_jump, 3)
n_dense = int((offs <= 8).sum())
rotate = 8
phase0 = np.concatenate([offs[:n_dense], offs[n_dense::rotate]])
if phase0[-1] != offs[-1]:
    phase0 = np.append(phase0, offs[-1])
dense_only = offs[:n_dense]
print(f"offsets: K={len(offs)} phase0={len(phase0)} dense={n_dense}", flush=True)

pos = jnp.asarray(pidx.step_pos, dtype=jnp.float32)
rank_a = jnp.asarray(pidx.step_rank.astype(np.int32))
cnt_a = jnp.asarray(pidx.step_count_of_step.astype(np.int32))
rev_a = jnp.asarray((pidx.step_handle & 1).astype(np.int32))
len_a = jnp.asarray(pidx.node_len.astype(np.float32))[
    jnp.asarray(pidx.step_node_idx.astype(np.int32))
]

rng = np.random.default_rng(0)
cs0 = jnp.asarray(rng.random((2 * D, S), dtype=np.float32) * 1e5)
frac = 0.25


def chain_sweep(sweep):
    @jax.jit
    def run(cs, n, key, *a):
        def step(i, cs):
            return sweep(cs, jax.random.fold_in(key, i),
                         jnp.float32(0.1), jnp.bool_(False), *a)
        return lax.fori_loop(0, n, step, cs)
    return lambda cs, n, *a: run(cs, jnp.int32(n), jax.random.key(0), *a)


def slope(fn, x0, arrays, n1=4, n2=20, reps=3):
    def go(n):
        out = fn(x0, n, *arrays)
        return np.asarray(jax.device_get(out.reshape(-1)[:8]))
    go(n1); go(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


args = (pos, rank_a, cnt_a, rev_a, len_a)

for label, offset_subset in (("full phase", phase0), ("dense only", dense_only)):
    sweep = make_nd_sweep_fn(offset_subset, S, D, lp, zetas, jnp.float32, frac)
    t = slope(chain_sweep(sweep), cs0, args)
    print(f"nd sweep [{label:10s}]: {t*1e3:7.2f} ms "
          f"({S*frac/t/1e6:7.1f}M upd/s at frac={frac})", flush=True)

import os

os.environ["GFASORT_DENSE_KERNEL"] = "xla"
sweep_x = make_nd_sweep_fn(phase0, S, D, lp, zetas, jnp.float32, frac)
t = slope(chain_sweep(sweep_x), cs0, args)
print(f"nd sweep [xla-only  ]: {t*1e3:7.2f} ms", flush=True)
os.environ["GFASORT_DENSE_KERNEL"] = "auto"

# 1D comparison (same protocol)
from gfasort_tpu.ops.sweep_common import make_offset_sampler
from gfasort_tpu.ops.sweep_dense import build_bucket_apply, kernel_kmax

sp = PathSGDParams().derive_from_graph(pidx)
sp = replace(sp, dtype="float32", pow_mode="fast")
zetas1 = zeta_table(sp.space, sp.space_max, sp.space_quantization_step, sp.theta)
offs1 = offset_set(max(1, min(int(sp.space), pidx.max_path_step_count - 1)), 2)
nd1 = int((offs1 <= 8).sum())
p1 = np.concatenate([offs1[:nd1], offs1[nd1::8]])
if p1[-1] != offs1[-1]:
    p1 = np.append(p1, offs1[-1])


def make_1d_sweep(offs_p, frac1):
    Kp = len(offs_p)
    _, _, sample_block = make_offset_sampler(offs_p, sp, zetas1, jnp.float32)
    kmax = kernel_kmax()
    kb = [(int(offs_p[ki]), ki) for ki in range(Kp) if offs_p[ki] <= kmax]
    ba = build_bucket_apply(kb, S, jnp.float32)
    served = {ki for _, ki in kb}

    def sweep(xs, key, eta, cooling, pos, rank_a, cnt_a):
        k1, k2 = jax.random.split(key, 2)
        bits = jax.random.bits(k1, (S,), jnp.uint32)
        u = jax.random.uniform(k2, (S,), dtype=jnp.float32)
        sidx = sample_block(bits, u, cooling, rank_a, cnt_a, frac1)
        iota = jax.lax.iota(jnp.int32, S)
        dsum, csum = ba(xs, pos, sidx, eta)
        for ki in range(Kp):
            if ki in served:
                continue
            k = int(offs_p[ki])

            def half(shift, w_mine, w_theirs):
                xs_o = jnp.roll(xs, shift)
                guard = iota < S + shift if shift < 0 else iota >= shift
                w_bool = w_mine | (w_theirs & guard)
                d = jnp.abs(pos - jnp.roll(pos, shift))
                valid = w_bool & (d != 0)
                w = valid.astype(xs.dtype)
                safe = jnp.where(valid, d, 1.0)
                mu = jnp.minimum(eta / safe, 1.0)
                dx = xs - xs_o
                dx = jnp.where(dx == 0, jnp.float32(1e-9), dx)
                mag = jnp.abs(dx)
                r_x = (mu * (mag - safe) / 2.0 / mag) * dx
                return -w * r_x, w

            d1, w1 = half(-k, sidx == ki, jnp.roll(sidx, -k) == ~ki)
            d2, w2 = half(+k, sidx == ~ki, jnp.roll(sidx, +k) == ki)
            dsum = dsum + d1 + d2
            csum = csum + w1 + w2
        return xs + dsum / jnp.maximum(csum, 1)

    return sweep


xs1 = jnp.asarray(rng.random(S, dtype=np.float32) * 1e5)
for frac1 in (0.8, 0.25):
    s1 = make_1d_sweep(p1, frac1)
    t = slope(chain_sweep(s1), xs1, (pos, rank_a, cnt_a))
    print(f"1d sweep [frac={frac1:4}]: {t*1e3:7.2f} ms "
          f"({S*frac1/t/1e6:7.1f}M upd/s)", flush=True)

# consensus cost on 2D rows vs 1 row
from gfasort_tpu.ops.grid_consensus import build_grid_consensus

gcx = build_grid_consensus(pidx.step_node_idx, N, path_of_step=pidx.step_path)
print(f"grid: cov={gcx.coverage:.4f} W={gcx.window} D={gcx.stride} "
      f"segs={gcx.n_segments}", flush=True)


def chain_cons(fn):
    @jax.jit
    def run(x, n, *a):
        def step(i, x):
            return fn(x, *a)[0] * 1.0000001
        return lax.fori_loop(0, n, step, x)
    return lambda x, n, *a: run(x, jnp.int32(n), *a)


for label, x0 in (("R=4 rows", cs0), ("R=1 row ", xs1)):
    t = slope(chain_cons(gcx.fn), x0, gcx.arrays)
    print(f"grid consensus [{label}]: {t*1e3:7.2f} ms", flush=True)
