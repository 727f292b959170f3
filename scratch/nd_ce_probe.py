"""Probe: nD layout consensus_every at the bench shape.

The 2D consensus (R=4 rows) costs ~35 ms/call; at ce=16 that is
~2.2 ms of the ~8.4 ms/sweep wall.  Round-3 stress measurements were
flat-to-BETTER with rarer consensus (oracle-ratio 1.066 at ce=8,
1.065 at ce=16, 1.034 at ce=24 on the 20k cert workload), so rarer
consensus is a free rate win if the certified stress holds.  This
probe times ce in {16, 32, 48} for 2D and 3D and certifies each with
the bench's layout_quality_vs_oracle.

Usage: python scratch/nd_ce_probe.py [--quality]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gfasort_tpu.bench_util import (
    bench_sweep_nd,
    layout_quality_vs_oracle,
    synthetic_path_index,
)

CES = [16, 32, 48]


def main():
    if "--quality" in sys.argv:
        for ce in CES:
            q = layout_quality_vs_oracle(
                n_nodes=20_000, steps_per_path=20_000,
                consensus_every=ce, rotate=8, active_frac=1.0,
            )
            print(f"[stress] ce={ce}: {q}", flush=True)
        return

    pidx = synthetic_path_index(1_000_000, 16, 250_000, seed=0)
    for dims in (2, 3):
        for ce in CES:
            r = bench_sweep_nd(
                pidx, dims=dims, rounds=48, repeats=1,
                consensus_every=ce, active_frac=1.0,
            )
            print(
                f"[rate] {dims}D ce={ce}: {r['updates_per_s']/1e6:8.1f} M/s"
                f"  warmup {r['warmup_s']:.1f}s  finite={r['final_finite']}",
                flush=True,
            )


if __name__ == "__main__":
    main()
