"""Native GFA parser parity tests."""

import numpy as np
import pytest

from gfasort_tpu.io import gfa
from gfasort_tpu.io.fast_gfa import parse_gfa_numeric_fast

needs_native = pytest.mark.skipif(
    not __import__("gfasort_tpu.native", fromlist=["available"]).available(),
    reason="no C++ toolchain",
)


@needs_native
@pytest.mark.parametrize("name", ["simple.gfa", "lil.gfa", "DRB1-3123.gfa"])
def test_fast_parser_identical(data_dir, name):
    text = (data_dir / name).read_text()
    gf = parse_gfa_numeric_fast(text)
    gp = gfa.parse_gfa_numeric(text)
    assert gf.nodes == gp.nodes
    assert gf.edges == gp.edges
    assert gf.node_order == gp.node_order
    assert len(gf.paths) == len(gp.paths)
    for p1, p2 in zip(gf.paths, gp.paths):
        assert p1.name == p2.name
        assert np.array_equal(p1.steps, p2.steps)


@needs_native
def test_fast_parser_edge_dedup():
    text = "S\t1\tA\nS\t2\tC\nL\t1\t+\t2\t+\t0M\nL\t2\t-\t1\t-\t0M\n"
    g = parse_gfa_numeric_fast(text)
    assert len(g.edges) == 1


@needs_native
def test_fast_parser_bad_id():
    with pytest.raises(ValueError):
        parse_gfa_numeric_fast("S\tfoo\tACGT\n")


@needs_native
def test_parser_nonplus_orient_is_reverse():
    # the reference CLI parser maps ANY non-'+' final char to reverse
    # (src/bin/gfasort.rs:142-151); '5*' must parse as 5-reverse
    text = "S\t5\tA\nS\t6\tC\nL\t5\t+\t6\t+\t0M\nP\tp\t5*,6+\t*\n"
    for g in (gfa.parse_gfa_numeric(text), parse_gfa_numeric_fast(text)):
        assert g.paths[0].steps.tolist() == [5 * 2 + 1, 6 * 2]


@needs_native
def test_fast_parser_roundtrip_canonical(simple_gfa):
    g = parse_gfa_numeric_fast(simple_gfa)
    assert gfa.canonical_gfa(g) == gfa.canonical_gfa(
        gfa.parse_gfa_numeric(simple_gfa)
    )


@needs_native
@pytest.mark.parametrize("keep_unmapped", [True, False])
def test_native_edge_remap_matches_python(keep_unmapped):
    """The C remap_edge_set fast path must agree with the Python loop on
    randomized edge sets and partial mappings (threshold forced to 0 by
    calling _remap_arrays on both a large-enough synthetic set)."""
    from gfasort_tpu.graph import BidirectedGraph

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 500, 6000
    handles = rng.integers(2, (n_nodes + 1) << 1, size=(n_edges, 2))
    edges = set(map(tuple, handles.tolist()))
    # partial mapping: remap ~half the ids, scrambled
    ids = rng.permutation(np.arange(1, n_nodes + 1))[: n_nodes // 2]
    mapping = {int(o): i + 1 for i, o in enumerate(ids)}

    g_native = BidirectedGraph()
    g_native.edges = set(edges)
    g_native._remap_arrays(mapping, keep_unmapped=keep_unmapped)

    # python reference loop (semantics from src/graph_ops.rs:52-83 and
    # :1983-2020)
    from gfasort_tpu import handle as H

    expected = set()
    for f, t in edges:
        fid, tid = H.node_id(f), H.node_id(t)
        if keep_unmapped:
            nf, nt = mapping.get(fid, fid), mapping.get(tid, tid)
        else:
            if fid not in mapping or tid not in mapping:
                continue
            nf, nt = mapping[fid], mapping[tid]
        expected.add(
            (H.encode(nf, H.is_reverse(f)), H.encode(nt, H.is_reverse(t)))
        )
    assert g_native.edges == expected


def _native_py_available():
    from gfasort_tpu.native.build import load_py

    return load_py() is not None


@pytest.mark.skipif(not _native_py_available(), reason="no C++ toolchain")
def test_native_helpers_match_python_at_scale():
    """The CPython-API fast paths (node_len_fill, edge_set_to_arrays,
    flip_edge_set, rc_nodes_inplace, format_*) dispatch only above 4096
    nodes/edges; build a graph past the threshold and compare against
    the pure-Python semantics."""
    import random

    import numpy as np

    from gfasort_tpu import BidirectedGraph
    from gfasort_tpu import handle as H
    from gfasort_tpu.algos.groom import apply_grooming_with_reorder
    from gfasort_tpu.io.gfa import write_gfa, write_gfa_library

    rng = random.Random(99)
    g = BidirectedGraph()
    n = 5000
    for i in range(1, n + 1):
        g.add_node(i, bytes(rng.choice(b"ACGTNx") for _ in range(rng.randint(1, 6))))
    for i in range(1, n):
        g.add_edge(H.encode(i, rng.randint(0, 1)), H.encode(i + 1, rng.randint(0, 1)))
    for _ in range(2000):
        a, b = rng.randint(1, n), rng.randint(1, n)
        g.add_edge(H.encode(a, rng.randint(0, 1)), H.encode(b, rng.randint(0, 1)))
    g.build_path("p0", [(i, bool(rng.randint(0, 1))) for i in range(1, n + 1)])

    # node_len_array / edges_to_arrays vs python
    nlen = g.node_len_array()
    assert nlen[0] == -1 and all(
        nlen[i] == (len(g.nodes[i]) if g.nodes[i] is not None else -1)
        for i in range(len(g.nodes))
    )
    ef, et = g.edges_to_arrays()
    assert set(zip(ef.tolist(), et.tolist())) == g.edges

    # write_gfa native vs forced-python (shrink a clone under threshold
    # is wrong — instead compare against a manual python rebuild)
    import gfasort_tpu.io.gfa as gfa_mod

    native_out = write_gfa(g)
    native_lib_out = write_gfa_library(g)
    orig = gfa_mod._native_writer
    gfa_mod._native_writer = lambda *a, **k: None
    try:
        assert native_out == write_gfa(g)
        assert native_lib_out == write_gfa_library(g)
    finally:
        gfa_mod._native_writer = orig

    # grooming application: native vs python on clones
    handles = [
        H.encode(i, rng.randint(0, 1)) for i in range(1, n + 1)
    ]
    g1, g2 = g.clone(), g.clone()
    apply_grooming_with_reorder(g1, handles, True)  # native (over threshold)
    # force python path by monkeypatching load_py
    import gfasort_tpu.native.build as build_mod

    orig_load = build_mod.load_py
    build_mod.load_py = lambda: None
    try:
        apply_grooming_with_reorder(g2, handles, True)
    finally:
        build_mod.load_py = orig_load
    assert g1.nodes == g2.nodes
    assert g1.edges == g2.edges
    assert all(
        np.array_equal(p1.steps, p2.steps) for p1, p2 in zip(g1.paths, g2.paths)
    )
