#!/usr/bin/env python
"""r5.2 probe: headline rate with the shared-chain multi-proposal
sampler (sample_block.multi) vs the recorded 6,210 M/s baseline
(per-proposal sample_block calls, BENCH_LOCAL_r5.json).  The sampler
restructure is BIT-identical (tests/test_sweep.py::
test_sample_blocks_bit_identical), so this is pure rate."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import bench_sweep_1d, synthetic_path_index

CFG = dict(consensus_every=96, per_octave=2, active_frac=1.0,
           rotate=12, dense_upto=4)

pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
for P in (12, 8, 16):
    try:
        r = bench_sweep_1d(pidx, rounds=96, repeats=3, proposals=P, **CFG)
        print(f"P={P}: {r['updates_per_s']/1e6:.1f} M/s  "
              f"warmup={r['warmup_s']:.0f}s finite={r['final_finite']}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"P={P}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
