#!/usr/bin/env python
"""Warm-process server end-to-end artifact (VERDICT r4 task 2).

Runs the SAME 1M-node CLI job TWICE through ``--server``:

* run 1 spawns the daemon and pays the full per-process warmup
  (parse + trace + remote compile + dispatch);
* run 2 dispatches into the live process's jit caches — the criterion
  is its SGD (Y) step wall <= 5 s, vs the 27-216 s cold-process
  first-dispatch cost the r4 compile-floor table measured.

Writes artifacts/E2E_SERVER_WARM.json with both runs' per-step walls
(from the CLI's --trace-out) and stops the daemon afterwards.

Usage:
    python scripts/e2e_server_warm.py                  # 1M nodes (TPU)
    python scripts/e2e_server_warm.py --nodes 50000    # reduced
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def step_walls(trace_path: pathlib.Path) -> dict:
    """step name -> wall seconds from a --trace-out JSONL."""
    walls = {}
    for line in trace_path.read_text().splitlines():
        ev = json.loads(line)
        if "seconds" in ev and ev.get("event"):
            walls[ev["event"]] = round(float(ev["seconds"]), 2)
    return walls


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--paths", type=int, default=16)
    ap.add_argument("--steps", type=int, default=250_000)
    ap.add_argument("--iter-max", type=int, default=30)
    ap.add_argument("--pipeline", default="Y")
    ap.add_argument("--work-dir", default="/tmp/gfasort_e2e")
    ap.add_argument("--artifact",
                    default=str(REPO / "artifacts" / "E2E_SERVER_WARM.json"))
    args = ap.parse_args()

    wd = pathlib.Path(args.work_dir)
    wd.mkdir(parents=True, exist_ok=True)
    gfa_in = wd / f"synthetic_{args.nodes}.gfa"
    sock = str(wd / "gfasort_warm.sock")

    from gfasort_tpu.tools.make_synthetic_gfa import write_synthetic_gfa

    if not gfa_in.exists():
        write_synthetic_gfa(
            str(gfa_in), n_nodes=args.nodes, n_paths=args.paths,
            steps_per_path=args.steps, seed=0,
        )
    print(f"[e2e-server] input: {gfa_in} "
          f"({gfa_in.stat().st_size >> 20} MiB)", file=sys.stderr,
          flush=True)

    env = dict(os.environ)
    env["GFASORT_SERVER_SOCKET"] = sock
    # PREPEND the repo: clobbering PYTHONPATH would drop site dirs the
    # backend plugin registers through (e.g. the axon tunnel's
    # sitecustomize)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )

    runs = []
    try:
        for i in (1, 2):
            out = wd / f"server_sorted_{i}.gfa"
            trace = wd / f"server_trace_{i}.jsonl"
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, "-m", "gfasort_tpu.cli",
                 "-i", str(gfa_in), "-o", str(out),
                 "-p", args.pipeline, "--engine", "sweep",
                 "--iter-max", str(args.iter_max),
                 "--trace-out", str(trace), "--server"],
                env=env, cwd=str(REPO), capture_output=True, text=True,
                timeout=3600,
            )
            wall = round(time.time() - t0, 2)
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode != 0:
                print(f"[e2e-server] run {i} FAILED rc={r.returncode}",
                      file=sys.stderr)
                return 1
            runs.append({
                "run": i,
                "total_wall_s": wall,
                "step_walls_s": step_walls(trace),
            })
            print(f"[e2e-server] run {i}: total {wall}s, steps "
                  f"{runs[-1]['step_walls_s']}", file=sys.stderr, flush=True)
    finally:
        subprocess.run(
            [sys.executable, "-m", "gfasort_tpu.server", "--socket", sock,
             "stop"],
            env=env, cwd=str(REPO), capture_output=True, timeout=60,
        )

    sgd2 = runs[1]["step_walls_s"].get("SGD")
    artifact = {
        "what": "same 1M-node CLI job twice through --server "
                "(VERDICT r4 task 2: warm run-2 Y step <= 5 s)",
        "nodes": args.nodes,
        "paths": args.paths,
        "steps_per_path": args.steps,
        "iter_max": args.iter_max,
        "pipeline": args.pipeline,
        "runs": runs,
        "warm_sgd_wall_s": sgd2,
        "ok": bool(sgd2 is not None and sgd2 <= 5.0),
    }
    pathlib.Path(args.artifact).parent.mkdir(exist_ok=True)
    pathlib.Path(args.artifact).write_text(json.dumps(artifact, indent=1))
    print(json.dumps(artifact, indent=1))
    return 0 if artifact["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
