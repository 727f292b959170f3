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

Usage:  python bench_scaling.py [max_devices] [--weak]
Prints one JSON line per mesh size.

``--weak``: weak scaling — the workload grows with the mesh (n_paths =
2 x devices, fixed steps per path), so every device holds the SAME
shard size at every mesh size and per-device updates/s is directly
comparable 1 -> N (docs/SCALING.md uses this mode for the CPU-mesh
sanity table; VERDICT r2 task 7).
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

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    weak = "--weak" in sys.argv[1:]
    max_dev = int(args[0]) if args else len(jax.devices())
    virtual = jax.default_backend() == "cpu"

    from dataclasses import replace

    from gfasort_tpu.bench_util import bench_params, synthetic_path_index
    from gfasort_tpu.parallel import default_mesh
    from gfasort_tpu.parallel.sweep_shard import build_sharded_sweep

    def make_workload(nd):
        if weak:
            # constant shard: 2 paths x 50k steps per device
            return synthetic_path_index(
                int(1e5), 2 * nd, int(5e4), seed=0
            )
        return synthetic_path_index(
            int(1e5) if virtual else int(1e6),
            16,
            int(5e4) if virtual else int(25e4),
            seed=0,
        )

    rounds = 16
    frac = 0.8

    sizes = []
    d = 1
    while d <= max_dev:
        sizes.append(d)
        d *= 2
    base_rate = None
    base_order = None
    for nd in sizes:
        pidx = make_workload(nd)
        ups = max(1, int(pidx.total_steps * frac))
        p = replace(
            bench_params(pidx, 1, 1), iter_max=rounds - 1,
            min_term_updates=ups,
        )
        mesh = default_mesh(nd)
        # consensus_every=None -> adaptive: base auto period scaled by
        # SHARD length (sweep_shard.shard_consensus_every; VERDICT r3
        # task 7) — strong-scaling rows show ce growing as shards shrink
        run, arrays, make_state, info = build_sharded_sweep(
            pidx, p, mesh, per_octave=2, consensus_every=None,
            active_frac=frac, rotate=8, expose_parts=not weak,
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
            x_final = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        updates = info["n_sweeps"] * info["updates_per_sweep"]
        rate = updates / best
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        psum_bytes = pidx.num_nodes * 4 * 2  # sum+count arrays
        row = {
            "devices": nd,
            "updates_per_s": round(rate, 1),
            "updates_per_s_per_device": round(rate / nd, 1),
            "scaling_efficiency": round(eff, 3),
            "virtual_devices": virtual,
            "weak": weak,
            "psum_bytes_per_consensus": psum_bytes,
            "shard_len": info["shard_len"],
            "consensus_every": info["consensus_every"],
            "grid_consensus": info["grid_consensus"],
        }
        if not weak:
            # per-period wall split (VERDICT r4 task 7): one consensus
            # period of sweeps WITHOUT the collective vs WITH it; the
            # difference isolates the per-period collective cost as
            # actually executed on this mesh.  Compare against the
            # docs/SCALING.md §4 model (collective ~const per period,
            # compute ∝ ce·S_shard).
            parts = info["parts"]

            def _best(fn, reps=5):
                out = fn(make_state()[0], key, *arrays)
                _ = np.asarray(out[:1, :4])  # compile
                b = float("inf")
                for _i in range(reps):
                    xs_t = make_state()[0]
                    t0 = time.perf_counter()
                    o = fn(xs_t, key, *arrays)
                    _ = np.asarray(o[:1, :4])
                    b = min(b, time.perf_counter() - t0)
                return b

            t_sweeps = _best(parts["sweeps_fn"])
            t_period = _best(parts["period_fn"])
            coll_ms = max((t_period - t_sweeps) * 1e3, 0.0)
            row["period_wall_ms"] = round(t_period * 1e3, 3)
            row["sweeps_wall_ms"] = round(t_sweeps * 1e3, 3)
            row["collective_ms"] = round(coll_ms, 3)
            row["collective_frac"] = round(
                coll_ms / max(t_period * 1e3, 1e-9), 4
            )
            row["model"] = "docs/SCALING.md#4"
            # strong mode: same workload at every size — report rank
            # agreement of this mesh's output against the 1-device run
            # (the adaptive period changes the schedule per mesh size,
            # so outputs are convergence-equivalent, not bit-equal)
            order = np.argsort(x_final, kind="stable")
            if base_order is None:
                base_order = order
                row["spearman_vs_1dev"] = 1.0
            else:
                from gfasort_tpu.bench_util import rank_quality

                row["spearman_vs_1dev"] = round(
                    rank_quality(order, base_order)["spearman"], 6
                )
        print(json.dumps(row), flush=True)
    if virtual:
        print(
            "# NOTE: virtual CPU devices share one host; wall-clock "
            "efficiency above is not a hardware scaling measurement",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
