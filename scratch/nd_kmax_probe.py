#!/usr/bin/env python
"""nD sweep full-phase timing vs GFASORT_KERNEL_KMAX (set in env).
The nd kernel's VMEM footprint grows with (2+D) x |qs| lane-rolled
copies, so large kmax may exceed the 16MB scoped-VMEM stack — this
probe is the safety + speed check before raising the default.

Usage: GFASORT_KERNEL_KMAX=... python scratch/nd_kmax_probe.py [dims]"""
import os
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
from gfasort_tpu.params import LayoutSGDParams

D = int(sys.argv[1]) if len(sys.argv) > 1 else 2
pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
S = pidx.total_steps
lp = replace(LayoutSGDParams().derive_from_graph(pidx, D),
             dtype="float32", pow_mode="fast")
zetas = zeta_table(lp.space, lp.space_max, lp.space_quantization_step, lp.theta)
offs = offset_set(max(1, min(int(lp.space), pidx.max_path_step_count - 1)), 3)
nd_ = int((offs <= 8).sum())
phase0 = np.concatenate([offs[:nd_], offs[nd_::8]])
if phase0[-1] != offs[-1]:
    phase0 = np.append(phase0, offs[-1])

pos = jnp.asarray(pidx.step_pos, dtype=jnp.float32)
rank_a = jnp.asarray(pidx.step_rank.astype(np.int32))
cnt_a = jnp.asarray(pidx.step_count_of_step.astype(np.int32))
rev_a = jnp.asarray((pidx.step_handle & 1).astype(np.int32))
len_a = jnp.asarray(pidx.node_len.astype(np.float32))[
    jnp.asarray(pidx.step_node_idx.astype(np.int32))
]
rng = np.random.default_rng(0)
cs0 = jnp.asarray(rng.random((2 * D, S), dtype=np.float32) * 1e5)

sweep = make_nd_sweep_fn(phase0, S, D, lp, zetas, jnp.float32, 0.25)


@jax.jit
def run(cs, n, key, *a):
    def step(i, cs):
        return sweep(cs, jax.random.fold_in(key, i),
                     jnp.float32(0.1), jnp.bool_(False), *a)
    return lax.fori_loop(0, n, step, cs)


args = (pos, rank_a, cnt_a, rev_a, len_a)
t0 = time.perf_counter()
np.asarray(jax.device_get(run(cs0, jnp.int32(4), jax.random.key(0), *args)[0, :8]))
warm = time.perf_counter() - t0


def go(n):
    t0 = time.perf_counter()
    np.asarray(jax.device_get(run(cs0, jnp.int32(n), jax.random.key(0), *args)[0, :8]))
    return time.perf_counter() - t0


go(4); go(20)
best = min(((go(20) - go(4)) / 16 for _ in range(3)))
print(f"kmax={os.environ.get('GFASORT_KERNEL_KMAX', '8')} D={D}: "
      f"{best*1e3:.2f} ms/sweep  warmup={warm:.1f}s", flush=True)
