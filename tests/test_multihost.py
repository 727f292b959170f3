"""Multi-host (multi-process) execution: a REAL 2-process x 4-device
CPU mesh running the sharded engines end-to-end via jax.distributed +
Gloo collectives (SURVEY §2 'Parallelism & communication' north star;
VERDICT r1 Missing #2).

The worker re-execs this file with a process id; the engines run
unchanged over the process-spanning mesh — the only cross-process
traffic is the consensus psum.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1])
port = sys.argv[2]

from gfasort_tpu.parallel.mesh import init_distributed, global_mesh, is_distributed
init_distributed("127.0.0.1:" + port, 2, pid)
assert is_distributed()
assert jax.process_count() == 2

import numpy as np
from dataclasses import replace
import __graft_entry__ as ge
from gfasort_tpu import YgsParams, PathIndex
from gfasort_tpu.params import LayoutSGDParams
from gfasort_tpu.parallel import (
    path_sgd_sort_sweep_sharded,
    path_linear_sgd_layout_sweep_sharded,
)

g = ge._toy_graph(n_nodes=32, n_paths=8)
params = replace(YgsParams.from_graph(g).path_sgd, dtype="float32",
                 pow_mode="fast", iter_max=2, batch=64)
mesh = global_mesh()
assert mesh.size == 8, mesh.size
order = path_sgd_sort_sweep_sharded(g, params, mesh)
assert sorted(h >> 1 for h in order) == list(range(1, 33))
pidx = PathIndex.from_graph(g)
lp = replace(LayoutSGDParams().derive_from_graph(pidx, 2),
             dtype="float32", pow_mode="fast", iter_max=2)
lay = path_linear_sgd_layout_sweep_sharded(g, lp, mesh, pidx)
assert np.isfinite(lay.coords).all()
# the sorted order must be IDENTICAL on every process (fully
# deterministic SPMD program, replicated output)
print("ORDER:" + ",".join(str(h) for h in order), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_mesh_runs_sharded_engines(tmp_path):
    worker = tmp_path / "mh_worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    orders = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("ORDER:")]
        assert lines, out[-2000:]
        orders.append(lines[-1])
    assert orders[0] == orders[1], "processes disagree on the sorted order"
