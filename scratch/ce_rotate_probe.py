"""Probe: throughput-config headroom in consensus_every and rotate.

The headline config (ce=48, rotate=8, po=2, frac=1.0) spends per sweep
~2.9 ms wall at the bench shape, of which roughly
  * ~0.5 ms is the R=1 grid consensus amortized over ce sweeps
    (24.5 ms/call, scratch/gc_parts_probe.py), and
  * the kernel pass scales with the per-phase bucket count
    (8 dense + ~(K - 8)/rotate large; po=2 -> K ~= 38).
This probe times the ce sweep {48, 96, 192} at rotate=8 on the bench
workload, then certifies any winner vs the bit-exact oracle at the
100k cert shape (the bench only ships configs it certifies in-run).
rotate=16 was removed from the grid: its phase bucket sets hit a
Mosaic compile bug ("result/input offset mismatch on non-concat
dimension" in the fused kernel's sublane-concat shifted views); the
rotate=12 follow-up measurement lives in ROUND3_NOTES.md
("rotate=8 -> 12" section) and sweep_common.auto_rotate's docstring.

Usage: python scratch/ce_rotate_probe.py [--quality]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gfasort_tpu.bench_util import (
    bench_sweep_1d,
    sweep_quality_vs_oracle,
    synthetic_path_index,
)

# rotate=16 REMOVED from the grid: its phase bucket sets hit a Mosaic
# compile bug ("result/input offset mismatch on non-concat dimension"
# in the sublane-concat views) — measured 2026-08-21; rotate=8 kernels
# compile and run everywhere.
CONFIGS = [
    ("base  ce=48  rot=8", dict(consensus_every=48, rotate=8)),
    ("ce96  ce=96  rot=8", dict(consensus_every=96, rotate=8)),
    ("ce192 ce=192 rot=8", dict(consensus_every=192, rotate=8)),
]
COMMON = dict(per_octave=2, active_frac=1.0)


def main():
    if "--quality" in sys.argv:
        for name, cfg in CONFIGS:
            q = sweep_quality_vs_oracle(
                n_nodes=100_000, steps_per_path=100_000, **COMMON, **cfg
            )
            print(f"[quality] {name}: {q}", flush=True)
        return

    pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
    for name, cfg in CONFIGS:
        r = bench_sweep_1d(pidx, rounds=96, repeats=2, **COMMON, **cfg)
        print(
            f"[rate] {name}: {r['updates_per_s']/1e6:8.1f} M/s  "
            f"warmup {r['warmup_s']:.1f}s  finite={r['final_finite']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
