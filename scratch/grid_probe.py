"""Correctness + speed of ops/grid_consensus.py vs gather-sum."""
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
from gfasort_tpu.ops.grid_consensus import build_grid_consensus

N = 1_000_000
pidx = synthetic_path_index(N, 16, 250_000, seed=0)
S = pidx.total_steps
step_node = pidx.step_node_idx

t0 = time.perf_counter()
gcx = build_grid_consensus(step_node, N, path_of_step=pidx.step_path)
t_build = time.perf_counter() - t0
print(f"build: {t_build:.2f}s cov={gcx.coverage:.5f} segs={gcx.n_segments} "
      f"W={gcx.window} D={gcx.stride}", flush=True)

rng = np.random.default_rng(0)
xs0_np = (rng.random(S).astype(np.float32) * 1e6)
xs0 = jnp.asarray(xs0_np)

# reference scatter-mean in f64
cnt = np.bincount(step_node, minlength=N).astype(np.float64)
ssum = np.zeros(N)
np.add.at(ssum, step_node, xs0_np.astype(np.float64))
x_node_ref = ssum / np.maximum(cnt, 1)
xs_ref = x_node_ref[step_node]

xs_new, x_node = jax.jit(lambda xs: gcx.fn(xs, *gcx.arrays))(xs0)
err_s = float(np.abs(np.asarray(xs_new) - xs_ref).max() / np.abs(xs_ref).max())
err_n = float(
    np.abs(np.asarray(x_node)[cnt > 0] - x_node_ref[cnt > 0]).max()
    / np.abs(x_node_ref).max()
)
print(f"relerr steps={err_s:.2e} nodes={err_n:.2e}", flush=True)


def chain(body):
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


tg = slope(chain(lambda xs, *a: gcx.fn(xs, *a)[0]), xs0, gcx.arrays)
print(f"grid consensus:   {tg*1e3:7.2f} ms", flush=True)

gc = build_gather_consensus(step_node, N, np.float32)
ta = slope(chain(lambda xs, *a: gc.fn(xs, *a)[0]), xs0, gc.arrays)
print(f"gather-sum:       {ta*1e3:7.2f} ms", flush=True)
