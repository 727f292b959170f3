#!/usr/bin/env python
"""Quantify TPU nested-fori_loop overhead vs captured operand volume.

Round-3 finding: moving the 8-sweep rotation block from a Python
unroll into an inner fori_loop cost ~10 ms per inner iteration at the
bench shape.  This probe isolates WHAT scales that cost: the loop
itself, the [S] carry, or the volume of captured invariant arrays.

Protocol: outer fori (2 iters) x inner fori (6 iters) vs the same 12
bodies fully unrolled inside one fori; body = one fused elementwise
pass over xs plus reads of captured arrays.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import jax.lax as lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S = 4_000_000
rng = np.random.default_rng(0)
xs0 = jnp.asarray(rng.random(S, dtype=np.float32))
pos = jnp.asarray(rng.random(S, dtype=np.float32))
NROWS = 60
dk = jnp.asarray(rng.random((NROWS, S), dtype=np.float32))


def body_small(xs, pos):
    return xs * 0.999999 + pos * 1e-9


def body_dk(xs, pos, dk):
    # read 10 dk rows by static index, like one rotation sweep does
    acc = xs * 0.999999
    for r in range(0, 50, 5):
        acc = acc + dk[r] * 1e-9
    return acc + pos * 1e-9


def timed(fn, *args, reps=4):
    f = jax.jit(fn)
    np.asarray(jax.device_get(f(*args)[:8]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(f(*args)[:8]))
        best = min(best, time.perf_counter() - t0)
    return best


def nested(body, *cap):
    def run(xs, *cap):
        def outer(i, xs):
            def inner(j, xs):
                return body(xs, *cap)
            return lax.fori_loop(0, 6, inner, xs)
        return lax.fori_loop(0, 2, outer, xs)
    return run


def flat(body, *cap):
    def run(xs, *cap):
        def outer(i, xs):
            for j in range(6):
                xs = body(xs, *cap)
            return xs
        return lax.fori_loop(0, 2, outer, xs)
    return run


for name, body, cap in (
    ("small (pos only)", body_small, (pos,)),
    ("dk 60 rows cap  ", body_dk, (pos, dk)),
):
    tn = timed(nested(body, *cap), xs0, *cap)
    tf = timed(flat(body, *cap), xs0, *cap)
    print(f"{name}: nested={tn*1e3:7.2f} ms  flat={tf*1e3:7.2f} ms  "
          f"delta/inner-iter={(tn-tf)/12*1e3:6.2f} ms", flush=True)
