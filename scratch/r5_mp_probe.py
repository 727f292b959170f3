#!/usr/bin/env python
"""Round-5 multi-proposal probe: rate at the bench shape for P=1..4
proposals per sweep (du4 grid), plus cert-shape quality for winners."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import bench_sweep_1d, synthetic_path_index

BASE = dict(consensus_every=96, per_octave=2, active_frac=1.0, rotate=12,
            dense_upto=4)

pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
for P in (1, 2, 3, 4):
    try:
        r = bench_sweep_1d(pidx, rounds=96, repeats=2, proposals=P, **BASE)
        print(f"P={P}: {r['updates_per_s']/1e6:.1f} M/s  "
              f"kern_b={r['kernel_buckets_per_phase']:.1f} "
              f"warmup={r['warmup_s']:.0f}s finite={r['final_finite']}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"P={P}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
