#!/usr/bin/env python
"""Calibrate the shape-aware zero-kwarg config (VERDICT r3 task 1).

Certifies, for each cell of a workload matrix (DRB1-like many-path
locus, mid-size many-path, chromosome cert shape), the 1D rank quality
vs the bit-exact oracle for three configs:

  * r3-default   — what zero-kwarg shipped in round 3
                   (po=4, ce=8, frac=clip(N/S,1/16,1), rotate=auto)
  * throughput   — the bench headline config
                   (po=2, ce=96, frac=1.0, rotate=12)
  * candidate    — sweep_common.auto_sweep_config(S, N)

The risky cell is (large S, high S/N): the candidate caps active_frac
at ~4 updates/node/sweep where the throughput config's frac=1.0 is
expected to oversmooth.  Layout matrix runs with --layout.

Usage: python scratch/auto_cfg_probe.py [--layout] [--quick]
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gfasort_tpu.bench_util import (
    layout_quality_vs_oracle,
    sweep_quality_vs_oracle,
)
from gfasort_tpu.ops.sweep_common import auto_sweep_config

# (name, n_nodes, n_paths, steps_per_path)
SHAPES = [
    ("drb1ish  S/N=12 small", 5_000, 12, 5_000),
    ("mid12    S/N=12 LARGE", 30_000, 12, 30_000),
    ("cert4    S/N=4  LARGE", 100_000, 4, 100_000),
]

R3_DEFAULT = dict()  # round-3 zero-kwarg: po=4 ce=8 frac=derived rot=auto
THROUGHPUT = dict(per_octave=2, consensus_every=96, active_frac=1.0, rotate=12)


def main():
    layout = "--layout" in sys.argv
    quick = "--quick" in sys.argv
    shapes = SHAPES[:1] if quick else SHAPES
    for name, n, p, spp in shapes:
        S, N = p * spp, n
        cand = auto_sweep_config(S, N, layout=layout)
        if layout:
            # nd runner takes no per_octave from auto dict directly
            configs = [
                ("r3-default", dict()),
                ("frac1.0   ", dict(active_frac=1.0, consensus_every=48,
                                    rotate=12)),
                ("candidate ", {k: v for k, v in cand.items()
                                if k != "per_octave"}),
            ]
            fn = layout_quality_vs_oracle
            kw = dict(n_nodes=n, n_paths=p, steps_per_path=spp)
        else:
            configs = [
                ("r3-default", R3_DEFAULT),
                ("throughput", THROUGHPUT),
                ("candidate ", cand),
            ]
            fn = sweep_quality_vs_oracle
            kw = dict(n_nodes=n, n_paths=p, steps_per_path=spp)
        print(f"== {name}: S={S} N={N} S/N={S/N:.1f}  "
              f"candidate={cand}", flush=True)
        for cname, cfg in configs:
            t0 = time.perf_counter()
            q = fn(**kw, **cfg)
            dt = time.perf_counter() - t0
            if layout:
                print(f"  {cname}: stress={q['stress']:.4f} "
                      f"oracle={q['oracle_stress']:.4f} "
                      f"ratio={q['ratio']:.3f}  [{dt:.0f}s]", flush=True)
            else:
                print(f"  {cname}: rank_mae_frac={q['rank_mae_frac']:.6f} "
                      f"spearman={q['spearman']:.7f}  [{dt:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
