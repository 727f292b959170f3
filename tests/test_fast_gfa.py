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
