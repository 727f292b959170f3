#!/usr/bin/env python
"""Round-3 production 1D sweep breakdown (kmax=1024 kernel path).

The bench at kmax=1024 runs ~3.3 ms/sweep incl. amortized consensus;
the HBM floor for the streams it touches is ~0.3-0.5 ms.  This probe
slope-times the production sweep body piecewise:

  1. sampler only (bits + uniform + sample_block)
  2. sampler + fused bucket kernel (k <= 1024)
  3. sampler + kernel + huge XLA buckets with dk tables (= production)
  4. production without dk (recompute d from pos rolls)

Usage: python scratch/sweep_breakdown2.py
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

from gfasort_tpu.bench_util import synthetic_path_index, bench_params
from gfasort_tpu.ops.fastpow import zeta_table
from gfasort_tpu.ops.sweep import offset_set
from gfasort_tpu.ops.sweep_common import make_offset_sampler
from gfasort_tpu.ops.sweep_dense import build_bucket_apply, kernel_kmax

pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
S = pidx.total_steps
params = bench_params(pidx, 1, 1)
fdt = jnp.float32
frac = 0.8

max_jump = max(1, min(int(params.space), pidx.max_path_step_count - 1))
offs_full = offset_set(max_jump, 2)
n_dense = int((offs_full <= 8).sum())
phase0 = np.concatenate([offs_full[:n_dense], offs_full[n_dense::8]])
if phase0[-1] != offs_full[-1]:
    phase0 = np.append(phase0, offs_full[-1])
kmax = kernel_kmax()
print(f"phase0={phase0.tolist()} kmax={kmax}", flush=True)

zetas = zeta_table(params.space, params.space_max,
                   params.space_quantization_step, params.theta)
_, _, sample_block = make_offset_sampler(phase0, params, zetas, fdt)
kb = [(int(phase0[i]), i) for i in range(len(phase0)) if phase0[i] <= kmax]
bucket_apply = build_bucket_apply(kb, S, fdt)
served = {ki for _, ki in kb}
huge = [(int(phase0[i]), i) for i in range(len(phase0)) if i not in served]
print(f"kernel buckets={len(kb)} huge={huge}", flush=True)

pos = jnp.asarray(pidx.step_pos, dtype=fdt)
rank_a = jnp.asarray(pidx.step_rank.astype(np.int32))
cnt_a = jnp.asarray(pidx.step_count_of_step.astype(np.int32))

pos_np = np.asarray(pidx.step_pos, dtype=np.float32)
dks = {}
for k, _ in huge:
    dks[(k, -1)] = jnp.asarray(np.abs(pos_np - np.roll(pos_np, -k)))
    dks[(k, +1)] = jnp.asarray(np.abs(pos_np - np.roll(pos_np, +k)))
dk_list = [dks[(k, s)] for k, _ in huge for s in (-1, +1)]


def make_sweep(mode):
    def sweep(xs, key, eta, pos, rank_a, cnt_a, *dk):
        k1, k2 = jax.random.split(key, 2)
        bits = jax.random.bits(k1, (S,), jnp.uint32)
        u = jax.random.uniform(k2, (S,), dtype=fdt)
        sidx = sample_block(bits, u, jnp.bool_(False), rank_a, cnt_a, frac)
        if mode == "sampler":
            return xs + 1e-12 * sidx.astype(fdt)
        iota = jax.lax.iota(jnp.int32, S)
        dsum, csum = bucket_apply(xs, pos, sidx, eta)
        if mode == "kernel":
            return xs + dsum / jnp.maximum(csum, 1)
        di = 0
        for k, ki in huge:
            def half(shift, w_mine, w_theirs, d):
                xs_o = jnp.roll(xs, shift)
                guard = iota < S + shift if shift < 0 else iota >= shift
                w_bool = w_mine | (w_theirs & guard)
                if mode == "nodk":
                    d = jnp.abs(pos - jnp.roll(pos, shift))
                valid = w_bool & (d != 0)
                w = valid.astype(fdt)
                safe = jnp.where(valid, d, 1.0)
                mu = jnp.minimum(eta / safe, 1.0)
                dx = xs - xs_o
                dx = jnp.where(dx == 0, fdt(1e-9), dx)
                mag = jnp.abs(dx)
                r_x = (mu * (mag - safe) / 2.0 / mag) * dx
                return -w * r_x, w
            d1, w1 = half(-k, sidx == ki, jnp.roll(sidx, -k) == ~ki, dk[di])
            d2, w2 = half(+k, sidx == ~ki, jnp.roll(sidx, +k) == ki, dk[di + 1])
            di += 2
            dsum = dsum + d1 + d2
            csum = csum + w1 + w2
        return xs + dsum / jnp.maximum(csum, 1)

    @jax.jit
    def run(xs, n, base_key, pos, rank_a, cnt_a, *dk):
        def body(i, xs):
            return sweep(xs, jax.random.fold_in(base_key, i), fdt(0.1),
                         pos, rank_a, cnt_a, *dk)
        return lax.fori_loop(0, n, body, xs)

    return run


def slope(run, args, n1=4, n2=20, reps=3):
    def go(n):
        out = run(args[0], jnp.int32(n), jax.random.key(0), *args[1:])
        return np.asarray(jax.device_get(out[:8]))
    go(n1); go(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


rng = np.random.default_rng(0)
xs0 = jnp.asarray(rng.random(S, dtype=np.float32) * 1e6)
base = (xs0, pos, rank_a, cnt_a)
for mode, args in (("sampler", base), ("kernel", base),
                   ("full", base + tuple(dk_list)),
                   ("nodk", base + tuple(dk_list))):
    t = slope(make_sweep(mode), args)
    print(f"{mode:8s}: {t*1e3:6.2f} ms/sweep", flush=True)
