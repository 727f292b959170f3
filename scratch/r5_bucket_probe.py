#!/usr/bin/env python
"""Round-5 task 1 probe: cut the VPU-bound bucket count per sweep.

Measures the bench-shape rate for the r4 throughput config and the
candidate coarser-jump-grid variants (dense_upto<8, per_octave=1,
rotate=16 retest).  Rates only — the winners get the full cert matrix
afterwards (sweep_quality_vs_oracle at the 100k shape).

Run: python scratch/r5_bucket_probe.py [config ...]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import bench_sweep_1d, synthetic_path_index

CONFIGS = {
    # r4 throughput baseline
    "base": dict(consensus_every=96, per_octave=2, active_frac=1.0,
                 rotate=12),
    # Mosaic compile-bug retest (ROUND4_NOTES roadmap 1)
    "rot16": dict(consensus_every=96, per_octave=2, active_frac=1.0,
                  rotate=16),
    # coarser dense grid: {1,2,3,4,6,8} instead of 1..8 (same <=8
    # every-phase treatment; only the grid density changes)
    "du4": dict(consensus_every=96, per_octave=2, active_frac=1.0,
                rotate=12, dense_upto=4),
    # factor-2 grid everywhere: {1,2,4,8,16,...}
    "po1": dict(consensus_every=96, per_octave=1, active_frac=1.0,
                rotate=12),
    "po1du4": dict(consensus_every=96, per_octave=1, active_frac=1.0,
                   rotate=12, dense_upto=4),
    "po1du2": dict(consensus_every=96, per_octave=1, active_frac=1.0,
                   rotate=12, dense_upto=2),
}

names = sys.argv[1:] or list(CONFIGS)
pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
for name in names:
    cfg = CONFIGS[name]
    try:
        r = bench_sweep_1d(pidx, rounds=96, repeats=2, **cfg)
        print(f"{name}: {r['updates_per_s']/1e6:.1f} M/s  "
              f"kern_b={r['kernel_buckets_per_phase']:.1f} "
              f"xla_b={r['xla_buckets_per_phase']:.1f} "
              f"warmup={r['warmup_s']:.0f}s finite={r['final_finite']}",
              flush=True)
    except Exception as e:  # noqa: BLE001 — compile bugs are a result here
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
