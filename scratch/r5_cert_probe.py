#!/usr/bin/env python
"""Certify round-5 candidate throughput configs against the bit-exact
oracle (100k chromosome-shape cert workload, iter_max=30 and the
reference-default iter_max=100)."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import sweep_quality_vs_oracle

CONFIGS = {
    "base": dict(consensus_every=96, per_octave=2, active_frac=1.0,
                 rotate=12),
    "du4": dict(consensus_every=96, per_octave=2, active_frac=1.0,
                rotate=12, dense_upto=4),
}

names = sys.argv[1:] or list(CONFIGS)
for name in names:
    cfg = CONFIGS[name]
    for im in (30, 100):
        q = sweep_quality_vs_oracle(n_nodes=100_000, steps_per_path=100_000,
                                    iter_max=im, **cfg)
        print(f"{name} iter{im}: mae={q['rank_mae_frac']:.2e} "
              f"spearman={q['spearman']:.7f}", flush=True)
