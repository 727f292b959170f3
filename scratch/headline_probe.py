#!/usr/bin/env python
"""Time ONLY the headline section (sweep 1D throughput mode) — used to
bisect the r3 609M vs r2 860M regression."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import bench_sweep_1d, synthetic_path_index

pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
r = bench_sweep_1d(pidx, rounds=96, repeats=3, consensus_every=48,
                   per_octave=2, active_frac=0.8, rotate=8)
print({k: round(v, 3) if isinstance(v, float) else v for k, v in r.items()},
      flush=True)
