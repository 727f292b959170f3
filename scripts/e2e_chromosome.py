#!/usr/bin/env python
"""Chromosome-scale end-to-end run (VERDICT r1 task 7).

Generates a >=1M-node synthetic pangenome GFA, runs the FULL CLI
pipeline ``sYgsuL`` with the sweep engine forced, verifies path-hash
invariance, and writes a timing-breakdown artifact
(artifacts/E2E_CHROMOSOME.json + the CLI's --trace-out step log).

Usage:
    python scripts/e2e_chromosome.py                  # 1M nodes (TPU)
    python scripts/e2e_chromosome.py --nodes 50000    # reduced
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--paths", type=int, default=16)
    ap.add_argument("--steps", type=int, default=250_000)
    ap.add_argument("--iter-max", type=int, default=30)
    ap.add_argument("--layout-iter", type=int, default=10)
    ap.add_argument("--work-dir", default="/tmp/gfasort_e2e")
    ap.add_argument("--artifact", default=str(REPO / "artifacts" / "E2E_CHROMOSOME.json"))
    args = ap.parse_args()

    wd = pathlib.Path(args.work_dir)
    wd.mkdir(parents=True, exist_ok=True)
    gfa_in = wd / f"synthetic_{args.nodes}.gfa"
    gfa_out = wd / "sorted.gfa"
    tsv_out = wd / "layout.tsv"
    trace_out = wd / "trace.jsonl"

    from gfasort_tpu.tools.make_synthetic_gfa import write_synthetic_gfa

    timings = {}
    if not gfa_in.exists():
        t0 = time.time()
        write_synthetic_gfa(
            str(gfa_in), n_nodes=args.nodes, n_paths=args.paths,
            steps_per_path=args.steps, seed=0,
        )
        timings["generate_gfa_s"] = round(time.time() - t0, 2)
    print(f"[e2e] input: {gfa_in} ({gfa_in.stat().st_size >> 20} MiB)",
          file=sys.stderr, flush=True)

    # pre-pipeline path hashes (the invariant every step must preserve)
    t0 = time.time()
    from gfasort_tpu.io.fast_gfa import load_gfa_numeric_fast

    g0 = load_gfa_numeric_fast(str(gfa_in))
    h0 = g0.compute_all_path_hashes()
    timings["load_and_hash_s"] = round(time.time() - t0, 2)
    n_nodes0, n_edges0 = g0.node_count(), len(g0.edges)
    del g0

    cmd = [
        sys.executable, "-m", "gfasort_tpu.cli",
        "-i", str(gfa_in), "-o", str(gfa_out),
        "-p", "sYgsuL",
        "--engine", "sweep",
        "--iter-max", str(args.iter_max),
        "--layout-iter", str(args.layout_iter),
        "--dimensions", "2",
        "--layout-out", str(tsv_out),
        "--trace-out", str(trace_out),
        "-v", "2",
    ]
    print("[e2e] running:", " ".join(cmd), file=sys.stderr, flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=str(REPO), capture_output=True, text=True)
    timings["cli_wall_s"] = round(time.time() - t0, 2)
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        print(f"[e2e] CLI FAILED rc={proc.returncode}", file=sys.stderr)
        return 1

    # verify: hashes preserved, structure sane (unchop merges nodes)
    t0 = time.time()
    g1 = load_gfa_numeric_fast(str(gfa_out))
    h1 = g1.compute_all_path_hashes()
    timings["reload_and_verify_s"] = round(time.time() - t0, 2)
    assert h1 == h0, "path hashes changed across sYgsuL!"

    steps = []
    if trace_out.exists():
        steps = [json.loads(ln) for ln in trace_out.read_text().splitlines()]

    import jax

    artifact = {
        "device": str(jax.devices()[0]),
        "workload": {
            "nodes": args.nodes, "paths": args.paths,
            "steps_per_path": args.steps,
            "input_nodes": n_nodes0, "input_edges": n_edges0,
            "output_nodes": g1.node_count(), "output_edges": len(g1.edges),
        },
        "pipeline": "sYgsuL", "engine": "sweep",
        "iter_max": args.iter_max, "layout_iter": args.layout_iter,
        "path_hashes_preserved": True,
        "timings": timings,
        "step_timings": steps,
    }
    out = pathlib.Path(args.artifact)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(artifact, indent=1))
    print(f"[e2e] OK — artifact: {out}", file=sys.stderr)
    print(json.dumps({"ok": True, "cli_wall_s": timings["cli_wall_s"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
