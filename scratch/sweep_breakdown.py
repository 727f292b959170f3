"""Probe: where does the XLA sweep's ~3ms go?

Times minimal sweep loops with configurable offset subsets:
  - sampler only
  - dense buckets only (1..8)
  - mid buckets only (9..4096 subset, ~what a rotation phase carries)
  - gap/huge buckets only (>4096 subset)
  - full phase set (dense + rotated large) — should match production

Slope timing (two chain lengths); axon tunnel dispatch latency is
150-400 ms so only slopes count.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import synthetic_path_index, bench_params
from gfasort_tpu.ops.fastpow import zeta_table
from gfasort_tpu.ops.sweep import offset_set
from gfasort_tpu.ops.sweep_common import make_offset_sampler

pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
S = pidx.total_steps
params = bench_params(pidx, 1, 1)
fdt = jnp.float32

max_jump = max(1, min(int(params.space), pidx.max_path_step_count - 1))
offs_full = offset_set(max_jump, 2)  # po=2, headline config
n_dense = int((offs_full <= 8).sum())
large = offs_full[n_dense:]
# phase 0 of rotate=8 + appended global max (as production does)
phase0 = np.concatenate([offs_full[:n_dense], large[::8]])
if phase0[-1] != offs_full[-1]:
    phase0 = np.append(phase0, offs_full[-1])

SETS = {
    "dense8": offs_full[:n_dense],
    "mid(<=4096)_of_phase0": phase0[(phase0 > 8) & (phase0 <= 4096)],
    "gap(>4096)_of_phase0": phase0[phase0 > 4096],
    "phase0_full": phase0,
}
print("full K =", len(offs_full), "phase0:", phase0.tolist())

zetas = zeta_table(params.space, params.space_max,
                   params.space_quantization_step, params.theta)

pos = jnp.asarray(pidx.step_pos, dtype=fdt)
rank_arr = jnp.asarray(pidx.step_rank.astype(np.int32))
cnt_arr = jnp.asarray(pidx.step_count_of_step.astype(np.int32))
ACTIVE_FRAC = 0.8


def make_loop(offs_p, mode="full"):
    offs_p = np.asarray(offs_p)
    Kp = len(offs_p)
    # sampler always built over the SAME full offset set so sampling
    # cost is identical; only the apply loop's bucket list changes
    _, _, sample_block = make_offset_sampler(phase0, params, zetas, fdt)
    # which sidx values correspond to this subset's buckets
    subset_ki = [int(np.where(phase0 == k)[0][0]) for k in offs_p]

    def sweep(xs, key, eta, pos, rank_a, cnt_a):
        k1, k2 = jax.random.split(key, 2)
        bits = jax.random.bits(k1, (S,), jnp.uint32)
        u = jax.random.uniform(k2, (S,), dtype=fdt)
        sidx = sample_block(bits, u, False, rank_a, cnt_a, ACTIVE_FRAC)
        if mode == "sampler":
            return xs + sidx.astype(fdt) * fdt(1e-30)
        iota = jax.lax.iota(jnp.int32, S)
        dsum = jnp.zeros_like(xs)
        csum = jnp.zeros_like(xs)
        for j, ki in enumerate(subset_ki):
            k = int(offs_p[j])

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
                dx = jnp.where(dx == 0, fdt(1e-9), dx)
                mag = jnp.abs(dx)
                r_x = (mu * (mag - safe) / 2.0 / mag) * dx
                return -w * r_x, w

            d1, w1 = half(-k, sidx == ki, jnp.roll(sidx, -k) == ~ki)
            d2, w2 = half(+k, sidx == ~ki, jnp.roll(sidx, +k) == ki)
            dsum = dsum + d1 + d2
            csum = csum + w1 + w2
        return xs + dsum / jnp.maximum(csum, 1)

    @jax.jit
    def run(xs, n, base_key, pos, rank_a, cnt_a):
        def body(i, xs):
            return sweep(xs, jax.random.fold_in(base_key, i),
                         fdt(0.1), pos, rank_a, cnt_a)
        return jax.lax.fori_loop(0, n, body, xs)

    return run


def slope(run, n1=4, n2=20, reps=3):
    xs0 = jnp.asarray(
        np.random.default_rng(0).random(S).astype(np.float32))
    key = jax.random.key(0)
    f = lambda n: np.asarray(jax.device_get(
        run(xs0, jnp.int32(n), key, pos, rank_arr, cnt_arr)[:8]))
    f(n1); f(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); f(n1)
        t1 = time.perf_counter(); f(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


r = make_loop(phase0, mode="sampler")
print(f"sampler only:      {slope(r)*1e3:7.2f} ms/sweep")
for name, offs_p in SETS.items():
    r = make_loop(offs_p)
    print(f"{name:22s} ({len(offs_p):2d} buckets): {slope(r)*1e3:7.2f} ms/sweep")
