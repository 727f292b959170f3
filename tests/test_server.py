"""Warm-process server tests (gfasort_tpu/server.py, VERDICT r4
task 2): spawn the daemon, run two CLI jobs through it (the second
reuses the live process), then stop it."""

import json
import os
import subprocess
import sys
import time

import pytest

from gfasort_tpu import server as srv_mod


@pytest.fixture
def srv_socket(tmp_path):
    path = str(tmp_path / "gfasort.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("GFASORT_IN_SERVER", None)
    env["PYTHONPATH"] = str(
        os.path.dirname(os.path.dirname(os.path.abspath(srv_mod.__file__)))
    )
    logf = open(tmp_path / "server.log", "ab")
    proc = subprocess.Popen(
        [sys.executable, "-m", "gfasort_tpu.server", "--socket", path,
         "serve"],
        stdout=logf, stderr=logf, env=env,
    )
    deadline = time.monotonic() + 60
    up = False
    while time.monotonic() < deadline:
        try:
            if srv_mod.request(path, {"op": "ping"}, timeout=2.0).get("ok"):
                up = True
                break
        except OSError:
            time.sleep(0.1)
    if not up:
        proc.kill()
        pytest.fail("server did not come up; see server.log")
    yield path
    try:
        srv_mod.request(path, {"op": "shutdown"}, timeout=5.0)
    except OSError:
        pass
    proc.wait(timeout=30)


def test_server_runs_cli_jobs_warm(srv_socket, tmp_path, data_dir):
    inp = str(data_dir / "lil.gfa")
    pids = set()
    walls = []
    for i in range(2):
        out = str(tmp_path / f"out{i}.gfa")
        resp = srv_mod.request(srv_socket, {
            "op": "run",
            "argv": ["-i", inp, "-o", out, "-p", "s", "-v", "1"],
            "cwd": str(tmp_path),
        })
        assert resp["rc"] == 0, resp["stderr"]
        assert "[gfasort] done" in resp["stderr"]
        assert os.path.exists(out)
        pids.add(resp["pid"])
        walls.append(resp["wall_s"])
    # both jobs ran in the SAME live process
    assert len(pids) == 1
    # outputs identical (deterministic pipeline, same input)
    a = open(tmp_path / "out0.gfa").read()
    b = open(tmp_path / "out1.gfa").read()
    assert a == b and a.startswith("H\t")


def test_server_ping_and_stop(srv_socket):
    r = srv_mod.request(srv_socket, {"op": "ping"}, timeout=2.0)
    assert r["ok"] and isinstance(r["pid"], int)


def test_server_module_status_cmd(srv_socket):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(
        os.path.dirname(os.path.dirname(os.path.abspath(srv_mod.__file__)))
    )
    out = subprocess.run(
        [sys.executable, "-m", "gfasort_tpu.server", "--socket", srv_socket,
         "status"],
        capture_output=True, text=True, env=env, timeout=30,
    )
    assert out.returncode == 0
    assert json.loads(out.stdout)["ok"] is True
