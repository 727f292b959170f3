"""Golden-output regression tests.

The sequential oracle is the framework's parity anchor (BASELINE.md:
reference goldens cannot be captured — no Rust toolchain — so parity is
defined algorithmically).  These tests pin the oracle-engine pipeline
outputs so that any future change to the RNG stack, Zipf sampling, eta
schedule, grooming, or topological sort that shifts the deterministic
result is caught immediately.

Goldens were generated from the oracle engine at seed 9399220, the
reference's fixed seed, with the deterministic iteration contract.
"""

import hashlib

from gfasort_tpu.io import gfa
from gfasort_tpu.pipeline import run_pipeline

# node sequences in final id order after the given pipeline (oracle)
GOLDEN_SEQS = {
    ("simple.gfa", "Ygs"): [
        "CAAATAAG", "A", "G", "T", "C", "TTG", "A", "G",
        "AAATTTTCTGGAGTTCTAT", "T", "A", "ATAT", "T", "A", "CCAACTCTCTG",
    ],
    ("lil.gfa", "Ygs"): [
        "CAAATAAG", "A", "G", "T", "C", "TTG", "G", "A",
        "AAATTTTCTGGAGTTCTAT", "T", "A", "ATAT", "T", "A", "CCAACTCTCTG",
    ],
    ("simple.gfa", "sYgs"): [
        "CAAATAAG", "A", "G", "T", "C", "TTG", "A", "G",
        "AAATTTTCTGGAGTTCTAT", "T", "A", "ATAT", "T", "A", "CCAACTCTCTG",
    ],
    ("lil.gfa", "sYgs"): [
        "CAAATAAG", "A", "G", "T", "C", "TTG", "G", "A",
        "AAATTTTCTGGAGTTCTAT", "T", "A", "ATAT", "T", "A", "CCAACTCTCTG",
    ],
}

# first path's handle values after the pipeline
GOLDEN_PATH0 = {
    ("simple.gfa", "Ygs"): [2, 6, 10, 12, 16, 18, 20, 24, 26, 30],
    ("lil.gfa", "Ygs"): [2, 6, 10, 12, 14, 18, 20, 24, 26, 30],
    ("simple.gfa", "sYgs"): [2, 6, 10, 12, 16, 18, 20, 24, 26, 30],
    ("lil.gfa", "sYgs"): [2, 6, 10, 12, 14, 18, 20, 24, 26, 30],
}

DRB1_YGS_SHA256 = "ef6d4d0aed52014133b2db10767f0c747c8cf6384941c157edc90bd04fdf20ab"


def _run(data_dir, name, pipeline):
    g = gfa.parse_gfa_numeric((data_dir / name).read_text())
    run_pipeline(g, pipeline=pipeline, engine="exact", verbose=0)
    return g


def test_golden_small_pipelines(data_dir):
    for (name, pipe), seqs in GOLDEN_SEQS.items():
        g = _run(data_dir, name, pipe)
        got = [g.nodes[i].decode() for i in g.live_node_ids()]
        assert got == seqs, f"{name} {pipe}: sequence order changed"
        got_path = [int(h) for h in g.paths[0].steps]
        assert got_path == GOLDEN_PATH0[(name, pipe)], f"{name} {pipe}: path changed"


def test_golden_drb1_ygs(data_dir):
    g = _run(data_dir, "DRB1-3123.gfa", "Ygs")
    fp = hashlib.sha256()
    for i in g.live_node_ids():
        fp.update(g.nodes[i])
        fp.update(b"|")
    assert fp.hexdigest() == DRB1_YGS_SHA256, "DRB1 Ygs ordering changed"
