#!/usr/bin/env python
"""Side-by-side slope timing: round-2 unrolled grid consensus vs the
round-3 lax.scan version (same geometry, same data).  Also times fwd
and bwd separately to localize any scan overhead."""
import importlib.util
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
from gfasort_tpu.ops import grid_consensus as gc_new

spec = importlib.util.spec_from_file_location("gc_r2", "/tmp/gc_r2.py")
gc_r2 = importlib.util.module_from_spec(spec)
sys.modules["gc_r2"] = gc_r2  # dataclass needs the module registered
spec.loader.exec_module(gc_r2)

N = 1_000_000
pidx = synthetic_path_index(N, 16, 250_000, seed=0)
S = pidx.total_steps
step_node = pidx.step_node_idx

rng = np.random.default_rng(0)
xs0 = jnp.asarray(rng.random(S).astype(np.float32) * 1e6)


def chain(body):
    @jax.jit
    def run(x, n, *a):
        def step(i, x):
            return body(x, *a) * 1.0000001
        return lax.fori_loop(0, n, step, x)
    return lambda x, n, *a: run(x, jnp.int32(n), *a)


def slope(fn, x0, arrays, n1=4, n2=20, reps=4):
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


for name, mod in (("r2 unrolled", gc_r2), ("r3 scan", gc_new)):
    gcx = mod.build_grid_consensus(step_node, N, path_of_step=pidx.step_path)
    t_full = slope(chain(lambda xs, *a: gcx.fn(xs, *a)[0]), xs0, gcx.arrays)
    # fwd only
    t_fwd = slope(
        chain(lambda xs, *a: xs + gcx.fwd(
            xs, a[0], a[1], a[2], a[3]
        )[:8].sum() * jnp.float32(1e-30)),
        xs0, gcx.arrays,
    )
    print(f"{name}: full={t_full*1e3:6.2f} ms  fwd-only={t_fwd*1e3:6.2f} ms",
          flush=True)
