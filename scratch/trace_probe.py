#!/usr/bin/env python
"""Measure TRACE+LOWER time of the sweep engines' run_chunk at bench
scale (S=4M), on the CPU backend — tracing and StableHLO lowering cost
is backend-independent, and it dominated every cold start in round 2
(VERDICT r2 weak #1: first bench section ~6-8 min to first result).

Usage: python scratch/trace_probe.py [1d|nd|both]

Round-3 changes probed here:
  * grid consensus segment loops -> lax.scan      (ops/grid_consensus.py)
  * rotation block fori_loop (8 traced sweep bodies, not 48)
  * dk tables stacked into one [n_dk, S] argument
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def probe_1d(ce):
    from dataclasses import replace

    from gfasort_tpu.bench_util import synthetic_path_index, bench_params
    from gfasort_tpu.ops.sweep import build_sweep_runner

    pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
    p = bench_params(pidx, 1, 1)
    S = pidx.total_steps
    frac = 0.8
    p = replace(p, iter_max=95, min_term_updates=int(S * frac))

    t0 = time.perf_counter()
    run, arrays, make_state, info = build_sweep_runner(
        pidx, p, per_octave=2, consensus_every=ce, active_frac=frac,
        rotate=8,
    )
    t_build = time.perf_counter() - t0
    print(f"[1d ce={ce}] build: {t_build:.1f}s info={info}")

    # grab the inner jitted chunk fn through the closure for a lower()
    # timing (run() dispatches it n times; lower measures one trace)
    import jax.numpy as jnp

    xs0, xn0 = make_state()
    cells = {c.cell_contents for c in run.__closure__ if hasattr(c, "cell_contents")}
    chunk = next(c for c in cells if getattr(c, "__name__", "") == "run_chunk")
    t0 = time.perf_counter()
    lowered = chunk.lower(xs0, jnp.int32(0), jax.random.key(0), *arrays)
    t_lower = time.perf_counter() - t0
    txt = lowered.as_text()
    n_lines = txt.count("\n")
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"[1d ce={ce}] trace+lower: {t_lower:.1f}s  "
          f"stablehlo_lines={n_lines}  cpu_compile: {t_compile:.1f}s")


def probe_nd(dims=2):
    from dataclasses import replace

    from gfasort_tpu.bench_util import synthetic_path_index
    from gfasort_tpu.ops.sweep_nd import build_sweep_nd_runner
    from gfasort_tpu.params import LayoutSGDParams

    pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
    lp = LayoutSGDParams().derive_from_graph(pidx, dims)
    S = pidx.total_steps
    frac = 0.25
    lp = replace(lp, iter_max=47, min_term_updates=int(S * frac),
                 dtype="float32", pow_mode="fast")

    t0 = time.perf_counter()
    run, arrays, make_state, info = build_sweep_nd_runner(
        pidx, lp, consensus_every=8, active_frac=frac, rotate=8,
    )
    t_build = time.perf_counter() - t0
    print(f"[nd d={dims}] build: {t_build:.1f}s info={info}")

    import jax.numpy as jnp

    from gfasort_tpu.ops.exact import layout_initial_coords

    init = layout_initial_coords(pidx, dims, lp.seed)
    cs0, csn0 = make_state(init)
    cells = {c.cell_contents for c in run.__closure__ if hasattr(c, "cell_contents")}
    chunk = next(c for c in cells if getattr(c, "__name__", "") == "run_chunk")
    t0 = time.perf_counter()
    lowered = chunk.lower(cs0, jnp.int32(0), jax.random.key(0), *arrays)
    t_lower = time.perf_counter() - t0
    n_lines = lowered.as_text().count("\n")
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"[nd d={dims}] trace+lower: {t_lower:.1f}s  "
          f"stablehlo_lines={n_lines}  cpu_compile: {t_compile:.1f}s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1d", "both"):
        probe_1d(48)
        probe_1d(8)
    if which in ("nd", "both"):
        probe_nd(2)
