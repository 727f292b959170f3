#!/usr/bin/env python
"""Multi-device scaling harness (BASELINE.md metric 4).

Runs the sharded sweep engine over meshes of 1..N devices on a fixed
workload and reports pair-updates/s per mesh size.  On real multi-chip
hardware this measures scaling efficiency directly; on this
environment's virtual CPU devices (all sharing one host) the wall-clock
numbers are NOT a scaling measurement — the run instead validates that
the sharded program compiles, executes, and keeps per-shard work
balanced, and reports the analytic communication volume (the only
collective is an [N]-sized psum per consensus, independent of S).

Usage:  python bench_scaling.py [max_devices]
Prints one JSON line per mesh size.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def main() -> int:
    import time

    import numpy as np

    import os

    import jax

    # sitecustomize force-selects the axon tunnel via jax.config (env
    # alone doesn't override it); honor an explicit cpu request so the
    # virtual-mesh validation mode is reachable
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    virtual = jax.default_backend() == "cpu"

    from dataclasses import replace

    from gfasort_tpu.bench_util import bench_params, synthetic_path_index
    from gfasort_tpu.parallel import default_mesh
    from gfasort_tpu.parallel.sweep_shard import build_sharded_sweep

    pidx = synthetic_path_index(
        int(1e5) if virtual else int(1e6),
        16,
        int(5e4) if virtual else int(25e4),
        seed=0,
    )
    rounds = 16
    frac = 0.8
    ups = max(1, int(pidx.total_steps * frac))
    p = replace(
        bench_params(pidx, 1, 1), iter_max=rounds - 1, min_term_updates=ups
    )

    sizes = []
    d = 1
    while d <= max_dev:
        sizes.append(d)
        d *= 2
    base_rate = None
    for nd in sizes:
        mesh = default_mesh(nd)
        run, arrays, make_state, info = build_sharded_sweep(
            pidx, p, mesh, per_octave=2, consensus_every=48, active_frac=frac, rotate=8
        )
        key = jax.random.key(0)
        xs0, xn0 = make_state()
        out = run(xs0, xn0, key, *arrays)
        _ = np.asarray(out[:4])  # compile + settle
        best = float("inf")
        for _rep in range(3):
            xs0, xn0 = make_state()
            t0 = time.perf_counter()
            out = run(xs0, xn0, key, *arrays)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        updates = info["n_sweeps"] * info["updates_per_sweep"]
        rate = updates / best
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        psum_bytes = pidx.num_nodes * 4 * 2  # sum+count arrays
        print(json.dumps({
            "devices": nd,
            "updates_per_s": round(rate, 1),
            "scaling_efficiency": round(eff, 3),
            "virtual_devices": virtual,
            "psum_bytes_per_consensus": psum_bytes,
            "shard_len": info["shard_len"],
        }))
    if virtual:
        print(
            "# NOTE: virtual CPU devices share one host; wall-clock "
            "efficiency above is not a hardware scaling measurement",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
