#!/usr/bin/env python
"""Grid-consensus tile-size sweep: FLOPs of the one-hot dots scale as
2*S*W*R and W scales with the per-tile node advance (~tile * N/S), so
smaller tiles should cut the consensus cost — until iota/one-hot
overheads and looser coverage bite.  Measures R=1 and R=4 at
T in {64, 128, 256, 512} on the bench workload."""
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
rng = np.random.default_rng(0)
xs1 = jnp.asarray(rng.random(S, dtype=np.float32) * 1e5)
xs4 = jnp.asarray(rng.random((4, S), dtype=np.float32) * 1e5)

# f64 scatter-mean reference for correctness
cnt = np.bincount(pidx.step_node_idx, minlength=N).astype(np.float64)
ssum = np.zeros(N)
np.add.at(ssum, pidx.step_node_idx, np.asarray(xs1, np.float64))
xs_ref = (ssum / np.maximum(cnt, 1))[pidx.step_node_idx]


def chain(fn):
    @jax.jit
    def run(x, n, *a):
        def step(i, x):
            return fn(x, *a)[0] * 1.0000001
        return lax.fori_loop(0, n, step, x)
    return lambda x, n, *a: run(x, jnp.int32(n), *a)


def slope(fn, x0, arrays, n1=4, n2=20, reps=3):
    def go(n):
        return np.asarray(jax.device_get(fn(x0, n, *arrays).reshape(-1)[:8]))
    go(n1); go(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); go(n1)
        t1 = time.perf_counter(); go(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


for T in (64, 128, 256, 512):
    gcx = build_grid_consensus(
        pidx.step_node_idx, N, path_of_step=pidx.step_path, tile=T
    )
    xs_new, _ = jax.jit(lambda xs: gcx.fn(xs, *gcx.arrays))(xs1)
    err = float(np.abs(np.asarray(xs_new) - xs_ref).max() / np.abs(xs_ref).max())
    t1 = slope(chain(gcx.fn), xs1, gcx.arrays)
    t4 = slope(chain(gcx.fn), xs4, gcx.arrays)
    print(f"T={T:4d} D={gcx.stride:5d} W={gcx.window:5d} segs={gcx.n_segments:4d} "
          f"cov={gcx.coverage:.4f} err={err:.1e}  "
          f"R=1 {t1*1e3:6.2f} ms  R=4 {t4*1e3:6.2f} ms", flush=True)
