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


# ---- round-5 golden breadth (VERDICT r4 task 6) ----

# Ygsu on the small fixtures and DRB1: unchop is a NO-OP on these
# graphs (no perfect-neighbor runs survive the sort), which is itself
# pinned behavior — the merge path is exercised by the chopped-chain
# golden below.  (Reference: src/ygs.rs:210-218.)
GOLDEN_SEQS_YGSU = {
    "simple.gfa": GOLDEN_SEQS[("simple.gfa", "Ygs")],
    "lil.gfa": GOLDEN_SEQS[("lil.gfa", "Ygs")],
}
DRB1_YGSU_SHA256 = DRB1_YGS_SHA256  # unchop no-op on DRB1 after Ygs


def test_golden_ygsu_small(data_dir):
    for name, seqs in GOLDEN_SEQS_YGSU.items():
        g = _run(data_dir, name, "Ygsu")
        got = [g.nodes[i].decode() for i in g.live_node_ids()]
        assert got == seqs, f"{name} Ygsu: sequence order changed"


def test_golden_drb1_ygsu(data_dir):
    g = _run(data_dir, "DRB1-3123.gfa", "Ygsu")
    assert g.node_count() == 4955  # unchop merges nothing on DRB1
    fp = hashlib.sha256()
    for i in g.live_node_ids():
        fp.update(g.nodes[i])
        fp.update(b"|")
    assert fp.hexdigest() == DRB1_YGSU_SHA256, "DRB1 Ygsu ordering changed"


# A deterministic chopped chain (CA|AA|TA|AG with a {G,T} bubble into
# CCC): Ygsu must merge the 4-node run and preserve path hashes.  The
# full canonical GFA output is pinned byte-for-byte (CLI-level identity
# through io/gfa.canonical_gfa).
CHOPPED_GFA = """H\tVN:Z:1.0
S\t1\tCA
S\t2\tAA
S\t3\tTA
S\t4\tAG
S\t5\tG
S\t6\tT
S\t7\tCCC
L\t1\t+\t2\t+\t0M
L\t2\t+\t3\t+\t0M
L\t3\t+\t4\t+\t0M
L\t4\t+\t5\t+\t0M
L\t4\t+\t6\t+\t0M
L\t5\t+\t7\t+\t0M
L\t6\t+\t7\t+\t0M
P\tp1\t1+,2+,3+,4+,5+,7+\t*
P\tp2\t1+,2+,3+,4+,6+,7+\t*
"""
CHOPPED_YGSU_CANONICAL_SHA256 = (
    "aa7dee273e10f30003306ad6c3b60a97f6aa1e59b44fa2393d693ae426abb213"
)


def test_golden_chopped_ygsu_canonical_bytes():
    from gfasort_tpu.pipeline import run_pipeline

    g = gfa.parse_gfa_numeric(CHOPPED_GFA)
    h0 = g.compute_all_path_hashes()
    run_pipeline(g, pipeline="Ygsu", engine="exact", verbose=0)
    assert g.node_count() == 4  # CA+AA+TA+AG merged into one node
    assert g.compute_all_path_hashes() == h0
    can = gfa.canonical_gfa(g)
    assert hashlib.sha256(can.encode()).hexdigest() == \
        CHOPPED_YGSU_CANONICAL_SHA256, "chopped Ygsu canonical GFA changed"


# Layout TSV golden: lil fixture through the oracle layout engine at
# the default derived params/seed (src/layout.rs:138-163 contract).
# The f64 C++ oracle is bit-deterministic, so the TSV text is pinned
# byte-for-byte.
LIL_LAYOUT_TSV_SHA256 = (
    "1d4e05b3dfacf638bedd009a551b56d6f8ec975197fa7281f88a3342073fed0d"
)


def test_golden_lil_layout_tsv(data_dir):
    import pytest

    from gfasort_tpu import native
    from gfasort_tpu.index import PathIndex
    from gfasort_tpu.params import LayoutSGDParams

    if not native.available():
        pytest.skip("native oracle not available")
    g = gfa.parse_gfa_numeric((data_dir / "lil.gfa").read_text())
    pidx = PathIndex.from_graph(g)
    lp = LayoutSGDParams().derive_from_graph(pidx, 2)
    layout = native.path_linear_sgd_layout_native(g, lp, pidx)
    tsv = layout.write_tsv()
    assert tsv.splitlines()[0] == "idx\tx+\ty+\tx-\ty-"
    assert len(tsv.splitlines()) == 16
    assert hashlib.sha256(tsv.encode()).hexdigest() == \
        LIL_LAYOUT_TSV_SHA256, "lil oracle layout TSV changed"
