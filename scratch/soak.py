#!/usr/bin/env python
"""Randomized soak: the sweep engine vs the bit-exact oracle across
varied synthetic shapes, including adversarial ones (shuffled walks
with no band locality -> gather-fallback consensus; many tiny paths;
single-path; reversal-heavy).  Checks finiteness + rank quality.

Usage: JAX_PLATFORMS=cpu python scratch/soak.py [n_cases]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from dataclasses import replace

from gfasort_tpu.bench_util import rank_quality, synthetic_path_index
from gfasort_tpu.index import PathIndex
from gfasort_tpu.native import available, path_linear_sgd_native
from gfasort_tpu.ops.sweep import path_linear_sgd_sweep
from gfasort_tpu.params import PathSGDParams


def shuffled_pidx(n_nodes, n_paths, steps, seed):
    """No band locality: random node per step (grid consensus must
    fall back to gather)."""
    rng = np.random.default_rng(seed)
    node_len = rng.integers(1, 17, size=n_nodes).astype(np.int64)
    handles, poss, pths, rnks, counts, lens = [], [], [], [], [], []
    for p in range(n_paths):
        nodes = rng.integers(0, n_nodes, size=steps)
        rev = rng.random(steps) < 0.3
        handles.append(((nodes + 1) << 1) | rev.astype(np.int64))
        lengths = node_len[nodes]
        poss.append(np.concatenate([[0], np.cumsum(lengths)[:-1]]))
        pths.append(np.full(steps, p, dtype=np.int32))
        rnks.append(np.arange(steps, dtype=np.int64))
        counts.append(steps)
        lens.append(int(lengths.sum()))
    step_handle = np.concatenate(handles)
    path_count = np.asarray(counts, dtype=np.int64)
    return PathIndex(
        step_handle=step_handle,
        step_pos=np.concatenate(poss),
        step_path=np.concatenate(pths),
        step_rank=np.concatenate(rnks),
        path_first=np.concatenate([[0], np.cumsum(path_count)[:-1]]).astype(np.int64),
        path_count=path_count,
        path_len=np.asarray(lens, dtype=np.int64),
        node_ids=np.arange(1, n_nodes + 1, dtype=np.int64),
        node_len=node_len,
        handle_to_idx={int(n): i for i, n in enumerate(range(1, n_nodes + 1))},
        step_node_idx=(step_handle >> 1) - 1,
        step_count_of_step=path_count[np.concatenate(pths)],
    )


def main(n_cases=10):
    assert available(), "native oracle required for the soak"
    rng = np.random.default_rng(20260821)
    fails = 0
    for c in range(n_cases):
        kind = c % 5
        if kind == 0:   # chromosome-like monotone
            n, p, s = int(rng.integers(5_000, 150_000)), int(rng.integers(1, 9)), int(rng.integers(10_000, 80_000))
            pidx = synthetic_path_index(n, p, s, seed=int(rng.integers(1e6)))
            label = f"monotone n={n} p={p} s={s}"
        elif kind == 1:  # shuffled, no locality
            n, p, s = int(rng.integers(2_000, 30_000)), int(rng.integers(1, 5)), int(rng.integers(5_000, 30_000))
            pidx = shuffled_pidx(n, p, s, seed=int(rng.integers(1e6)))
            label = f"shuffled n={n} p={p} s={s}"
        elif kind == 2:  # many tiny paths
            n, p, s = int(rng.integers(500, 5_000)), int(rng.integers(50, 200)), int(rng.integers(20, 200))
            pidx = synthetic_path_index(n, p, s, seed=int(rng.integers(1e6)))
            label = f"tiny-paths n={n} p={p} s={s}"
        elif kind == 3:  # single long path
            n, s = int(rng.integers(10_000, 100_000)), int(rng.integers(20_000, 120_000))
            pidx = synthetic_path_index(n, 1, s, seed=int(rng.integers(1e6)))
            label = f"single-path n={n} s={s}"
        else:            # few nodes, huge coverage
            n, p, s = int(rng.integers(100, 2_000)), int(rng.integers(2, 9)), int(rng.integers(10_000, 50_000))
            pidx = synthetic_path_index(n, p, s, seed=int(rng.integers(1e6)))
            label = f"dense-coverage n={n} p={p} s={s}"

        params = replace(
            PathSGDParams().derive_from_graph(pidx),
            iter_max=20, dtype="float32", pow_mode="fast",
        )
        x = path_linear_sgd_sweep(None, params, pidx)
        po = replace(params, dtype="float64", pow_mode="fpp")
        xo = path_linear_sgd_native(None, po, pidx)
        ok_fin = bool(np.isfinite(x).all())
        q = rank_quality(np.argsort(x, kind="stable"),
                         np.argsort(xo, kind="stable"))
        ok_q = q["spearman"] >= 0.99
        status = "OK " if (ok_fin and ok_q) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"[{status}] {label}: finite={ok_fin} "
              f"mae={q['rank_mae_frac']:.5f} sp={q['spearman']:.5f}",
              flush=True)
    print(f"soak: {n_cases - fails}/{n_cases} passed", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 10))
