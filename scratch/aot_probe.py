#!/usr/bin/env python
"""Per-process compile floor: does the persistent cache now capture
axon compiles, and does a warm second run hit it? (VERDICT r3 task 5)

r3 recorded "the local persistent cache NEVER captures axon compiles
(0 new entries written)" and scoped jax.export / executable
serialization as the round-4 attack.  This probe re-measures the
premise first: it runs the same-shape CLI Y step (1M-node synthetic,
sweep engine) in two FRESH processes and reports each run's step time
plus the cache delta.  Success criterion (VERDICT): second run's Y
step <= 15 s.

If the cache does NOT warm the second run, the fallback experiment
(--export) round-trips a representative jitted program through
jax.export serialize/deserialize in a fresh process and times the
rerun, documenting whether deserialized executables are accepted.

Usage: python scratch/aot_probe.py [--nodes 1000000] [--export]
"""

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CACHE = pathlib.Path("/root/.jax_cache")


def cache_stat():
    files = list(CACHE.glob("*-cache")) if CACHE.exists() else []
    return len(files), sum(f.stat().st_size for f in files)


def run_y_step(gfa_in: pathlib.Path, out: pathlib.Path) -> dict:
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "gfasort_tpu.cli", "-i", str(gfa_in),
         "-o", str(out), "-p", "Y", "--engine", "sweep",
         "--iter-max", "30", "-v", "1"],
        capture_output=True, text=True, cwd=str(REPO), timeout=1800,
    )
    wall = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"SGD took ([0-9.]+)s", r.stdout)
    miss = re.search(r"compile cache: (\d+) MISS", r.stdout)
    return {
        "wall_s": round(wall, 1),
        "y_step_s": float(m.group(1)) if m else None,
        "cache_misses": int(miss.group(1)) if miss else 0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--export", action="store_true")
    args = ap.parse_args()

    if args.export:
        return export_probe()

    wd = pathlib.Path("/tmp/gfasort_e2e")
    wd.mkdir(parents=True, exist_ok=True)
    gfa_in = wd / f"synthetic_{args.nodes}.gfa"
    if not gfa_in.exists():
        print(f"[aot] generating {gfa_in} ...", flush=True)
        from gfasort_tpu.tools.make_synthetic_gfa import write_synthetic_gfa

        write_synthetic_gfa(str(gfa_in), n_nodes=args.nodes, n_paths=16,
                            steps_per_path=args.nodes // 4)

    n0, b0 = cache_stat()
    r1 = run_y_step(gfa_in, wd / "aot1.gfa")
    n1, b1 = cache_stat()
    r2 = run_y_step(gfa_in, wd / "aot2.gfa")
    n2, b2 = cache_stat()
    out = {
        "run1": r1, "run2": r2,
        "cache_entries": [n0, n1, n2],
        "cache_bytes": [b0, b1, b2],
        "warm_le_15s": bool(r2["y_step_s"] and r2["y_step_s"] <= 15.0),
    }
    print(json.dumps(out, indent=1), flush=True)


def export_probe():
    """Round-trip a sweep-engine-shaped program through jax.export in a
    fresh process (documented fallback if the cache path fails)."""
    code = r"""
import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from jax import export
def f(x, k):
    def body(i, x):
        return x * 0.999 + jnp.roll(x, 17) * 0.001 + jax.random.uniform(
            jax.random.fold_in(k, i), x.shape, x.dtype) * 1e-6
    return jax.lax.fori_loop(0, 50, body, x)
x = jnp.zeros(1 << 22, jnp.float32)
k = jax.random.key(0)
t0 = time.perf_counter()
exp = export.export(jax.jit(f))(x, k)
ser = exp.serialize()
print("export+serialize:", round(time.perf_counter() - t0, 2), "s,",
      len(ser), "bytes", flush=True)
open("/tmp/aot_exported.bin", "wb").write(ser)
"""
    code2 = r"""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from jax import export
ser = open("/tmp/aot_exported.bin", "rb").read()
t0 = time.perf_counter()
exp = export.deserialize(ser)
x = jnp.zeros(1 << 22, jnp.float32)
k = jax.random.key(0)
y = jnp.asarray(exp.call(x, k))[:4]
print("deserialize+first-call:", round(time.perf_counter() - t0, 2), "s",
      flush=True)
t0 = time.perf_counter()
y = jnp.asarray(exp.call(x, k))[:4]
print("second call:", round(time.perf_counter() - t0, 3), "s", flush=True)
"""
    for i, c in enumerate((code, code2)):
        r = subprocess.run([sys.executable, "-c", c], capture_output=True,
                           text=True, timeout=900)
        print(f"[export probe process {i}] rc={r.returncode}")
        print(r.stdout)
        if r.returncode:
            print(r.stderr[-2000:])


if __name__ == "__main__":
    sys.exit(main())
