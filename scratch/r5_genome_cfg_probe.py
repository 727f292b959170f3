#!/usr/bin/env python
"""Genome-scale (>=1M-node) calibration row for the zero-kwarg policy
(VERDICT r4 task 5: the r4 policy certs 5.57e-3 at 4M nodes / 30
iters — thresholds were calibrated at 100k; target <= 2e-3).

Runs the C++ oracle ONCE on the genome workload (cached to /tmp as
.npy — it dominates probe cost at ~9 min) and certifies candidate
configs against it.

Usage: python scratch/r5_genome_cfg_probe.py [--nodes 4000000] [cfg ...]
"""
import pathlib
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import rank_quality, synthetic_path_index
from gfasort_tpu.native import path_linear_sgd_native
from gfasort_tpu.ops.sweep import path_linear_sgd_sweep
from gfasort_tpu.params import PathSGDParams

N_NODES = 4_000_000
if "--nodes" in sys.argv:
    N_NODES = int(sys.argv[sys.argv.index("--nodes") + 1])
N_PATHS = 16
SPP = N_NODES // 4  # S/N = 4 like the r4 genome rows
ITER = 30

CONFIGS = {
    # the shipped zero-kwarg policy (resolves per auto_sweep_config)
    "policy": dict(),
    # candidates: more frequent consensus at genome scale
    "ce48": dict(per_octave=2, consensus_every=48, active_frac=1.0,
                 rotate=12, dense_upto=4, proposals=3),
    "ce24": dict(per_octave=2, consensus_every=24, active_frac=1.0,
                 rotate=12, dense_upto=4, proposals=3),
    "ce8": dict(per_octave=2, consensus_every=8, active_frac=1.0,
                rotate=12, dense_upto=4, proposals=3),
    # finer jump grid at genome scale
    "po4": dict(per_octave=4, consensus_every=96, active_frac=1.0,
                rotate=12, dense_upto=8, proposals=3),
}

names = [a for a in sys.argv[1:] if not a.startswith("--")
         and not a.isdigit()] or list(CONFIGS)

pidx = synthetic_path_index(N_NODES, N_PATHS, SPP, seed=7)
S, N = pidx.total_steps, pidx.num_nodes
print(f"workload: N={N} S={S} iters={ITER}", flush=True)

p = replace(PathSGDParams().derive_from_graph(pidx),
            iter_max=ITER, dtype="float32", pow_mode="fast")

cache = pathlib.Path(f"/tmp/oracle_{N_NODES}_{N_PATHS}_{SPP}_{ITER}.npy")
if cache.exists():
    x_oracle = np.load(cache)
    print(f"oracle: cached {cache}", flush=True)
else:
    po = replace(p, dtype="float64", pow_mode="fpp")
    t0 = time.perf_counter()
    x_oracle = path_linear_sgd_native(None, po, pidx)
    print(f"oracle: {time.perf_counter()-t0:.0f}s", flush=True)
    np.save(cache, x_oracle)
order_o = np.argsort(x_oracle, kind="stable")

for name in names:
    cfg = CONFIGS[name]
    t0 = time.perf_counter()
    x = path_linear_sgd_sweep(None, p, pidx, **cfg)
    dt = time.perf_counter() - t0
    q = rank_quality(np.argsort(x, kind="stable"), order_o)
    print(f"{name}: mae={q['rank_mae_frac']:.3e} "
          f"spearman={q['spearman']:.6f} engine_wall={dt:.0f}s", flush=True)
