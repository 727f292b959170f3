"""Probe: window-merge strategies for banded consensus.

The banded dots cost ~6 ms each; the [g,W] window scatter (30 ms) and
gather (15 ms) dominate.  Candidates measured here:
  A. scatter_add, one call, unsorted (current)          [baseline]
  B. scatter_add per path, indices_are_sorted=True      (bases monotone per path)
  C. uniform-grid overlap-add: W/D dynamic-update-slice adds per path
  D. gather, one call (current backward)                [baseline]
  E. uniform-grid slicing for the backward windows
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

N = 1_000_000
P = 16
T = 256
SP = 250_000
S = P * SP
tiles_per_path = SP // T  # 976 full tiles (ignore remainder for the probe)
g = P * tiles_per_path
D = 1024           # uniform grid stride (approximates N/SP * T)
W = 2 * D          # window = 2 grid strides
print(f"g={g} W={W} D={D}", flush=True)

rng = np.random.default_rng(0)
# per-path monotone bases with uniform grid: base = j*D (clipped)
bases_per_path = np.minimum(np.arange(tiles_per_path) * D, N - W).astype(np.int32)
bases = np.tile(bases_per_path, P)
bases_j = jnp.asarray(bases)
bases_pp_j = jnp.asarray(bases_per_path)

wsum0 = jnp.asarray(rng.random((g, W)).astype(np.float32))
xne0 = jnp.asarray(rng.random(N + 2 * W).astype(np.float32))

scatter_dnums = lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,),
)
gather_dnums = lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
)


def merge_a(w, b):
    idx = b[:, None]
    return lax.scatter_add(jnp.zeros(N + 2 * W, jnp.float32), idx, w,
                           scatter_dnums, indices_are_sorted=False,
                           unique_indices=False)


def merge_b(w, bpp):
    out = jnp.zeros(N + 2 * W, jnp.float32)
    idx = bpp[:, None]
    wp = w.reshape(P, tiles_per_path, W)
    for p in range(P):
        out = lax.scatter_add(out, idx, wp[p], scatter_dnums,
                              indices_are_sorted=True, unique_indices=False)
    return out


def merge_c(w, b):
    """Uniform grid: base_j = j*D per path; overlap-add = W/D slice adds."""
    out = jnp.zeros(N + 2 * W, jnp.float32)
    wp = w.reshape(P, tiles_per_path, W)
    L = tiles_per_path * D
    for p in range(P):
        for r in range(W // D):
            chunk = wp[p, :, r * D:(r + 1) * D].reshape(L)
            seg = lax.dynamic_slice(out, (r * D,), (L,))
            out = lax.dynamic_update_slice(out, seg + chunk, (r * D,))
    return out


def gath_d(x, b):
    idx = b[:, None]
    return lax.gather(x, idx, gather_dnums, slice_sizes=(W,))


def gath_e(x, b):
    """Uniform grid backward: W/D shifted reshapes per path."""
    L = tiles_per_path * D
    parts = []
    for r in range(W // D):
        parts.append(lax.dynamic_slice(x, (r * D,), (L,)).reshape(tiles_per_path, D))
    xw = jnp.concatenate(parts, axis=1)          # [tiles_per_path, W]
    return jnp.tile(xw, (P, 1))                   # same windows per path here


def chain(body):
    def run(x, n, *a):
        def step(i, x):
            return body(x, *a)
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


# correctness of C vs A on one call
ra = np.asarray(jax.jit(merge_a)(wsum0, bases_j))
rc = np.asarray(jax.jit(merge_c)(wsum0, bases_j))
print(f"merge C vs A max abs diff: {np.abs(ra - rc).max():.3e}", flush=True)

ta = slope(chain(lambda w, b: w * 1.0 + merge_a(w, b)[:128].sum() * 1e-20), wsum0, (bases_j,))
print(f"A one unsorted scatter:        {ta*1e3:7.2f} ms", flush=True)
tb = slope(chain(lambda w, b: w * 1.0 + merge_b(w, b)[:128].sum() * 1e-20), wsum0, (bases_pp_j,))
print(f"B per-path sorted scatter:     {tb*1e3:7.2f} ms", flush=True)
tc = slope(chain(lambda w, b: w * 1.0 + merge_c(w, b)[:128].sum() * 1e-20), wsum0, (bases_j,))
print(f"C grid overlap-add slices:     {tc*1e3:7.2f} ms", flush=True)
td = slope(chain(lambda x, b: x + gath_d(x, b).sum() * 1e-20), xne0, (bases_j,))
print(f"D one gather:                  {td*1e3:7.2f} ms", flush=True)
te = slope(chain(lambda x, b: x + gath_e(x, b).sum() * 1e-20), xne0, (bases_j,))
print(f"E grid slice windows:          {te*1e3:7.2f} ms", flush=True)
