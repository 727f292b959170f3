"""Verification suite and legacy-compat layer tests."""

import numpy as np

from gfasort_tpu import BidirectedGraph
from gfasort_tpu import handle as H
from gfasort_tpu.compat import SimpleGraph, tarjan_scc, union_find_components
from gfasort_tpu.io import gfa
from gfasort_tpu.verify import (
    comprehensive_verify,
    reconstruct_path_sequence,
    validate_gfa_format,
    verify_edge_traversal,
    verify_path_embedding,
)


def test_path_embedding_detects_missing_edge():
    g = BidirectedGraph()
    g.add_node(1, b"A")
    g.add_node(2, b"C")
    g.build_path("p", [(1, False), (2, False)])
    errs = verify_path_embedding(g)
    assert len(errs) == 1 and "no edge" in errs[0]
    g.add_edge(H.forward(1), H.forward(2))
    assert verify_path_embedding(g) == []
    # complement-form edge also satisfies the check
    g2 = BidirectedGraph()
    g2.add_node(1, b"A")
    g2.add_node(2, b"C")
    g2.edges.add((H.reverse(2), H.reverse(1)))
    g2.build_path("p", [(1, False), (2, False)])
    assert verify_path_embedding(g2) == []


def test_edge_traversal_detects_dead_node():
    g = BidirectedGraph()
    g.add_node(1, b"A")
    g.edges.add((H.forward(1), H.forward(9)))
    errs = verify_edge_traversal(g)
    assert any("dead" in e for e in errs)


def test_reconstruct_path_sequence():
    g = BidirectedGraph()
    g.add_node(1, b"ATG")
    g.add_node(2, b"CGA")
    g.build_path("p", [(1, False), (2, True)])
    assert reconstruct_path_sequence(g, 0) == b"ATGTCG"


def test_validate_gfa_format(simple_gfa):
    assert validate_gfa_format(simple_gfa) == []
    bad = "S\t1\nL\t1\t+\t9\t+\t0M\nP\tp\t1x\t*\n"
    errs = validate_gfa_format(bad)
    assert any("S line" in e for e in errs)
    assert any("undeclared segment 9" in e for e in errs)
    assert any("missing orientation" in e for e in errs)


def test_comprehensive_verify_pipeline(lil_gfa):
    from gfasort_tpu.pipeline import run_pipeline

    g = gfa.parse_gfa_numeric(lil_gfa)
    g.verify_path_edges()
    hashes = g.compute_all_path_hashes()
    run_pipeline(g, pipeline="Ygsu", iter_max=5, verbose=0)
    report = comprehensive_verify(g, expected_hashes=hashes)
    assert report.ok, report.all_errors()


def test_comprehensive_detects_hash_change(simple_gfa):
    g = gfa.parse_gfa_numeric(simple_gfa)
    hashes = g.compute_all_path_hashes()
    nid = g.live_node_ids()[0]
    g.nodes[nid] = b"XXXX"  # corrupt a sequence
    report = comprehensive_verify(g, expected_hashes=hashes)
    assert not report.ok
    assert report.hash_mismatches


# ---------------------------------------------------------------- compat
def test_simple_graph_roundtrip(simple_gfa):
    g = gfa.parse_gfa_numeric(simple_gfa)
    sg = SimpleGraph.from_bidirected(g)
    assert len(sg.nodes) == 15
    g2 = sg.to_bidirected()
    assert g2.node_count() == 15
    # forward-forward edges survive the round trip
    ff = {(f >> 1, t >> 1) for f, t in g.edges if not (f & 1) and not (t & 1)}
    assert {(f >> 1, t >> 1) for f, t in g2.edges} == ff


def test_simple_topo_sort():
    sg = SimpleGraph(nodes={1: b"A", 2: b"C", 3: b"G"},
                     edges={(1, 2), (2, 3)})
    assert sg.topological_sort() == [1, 2, 3]
    # with a cycle: breaks at min id
    sg2 = SimpleGraph(nodes={1: b"A", 2: b"C"}, edges={(1, 2), (2, 1)})
    order = sg2.topological_sort()
    assert sorted(order) == [1, 2]


def test_tarjan_scc():
    sg = SimpleGraph(nodes={i: b"A" for i in range(1, 6)},
                     edges={(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)})
    sccs = tarjan_scc(sg)
    assert [1, 2, 3] in sccs
    assert [4] in sccs and [5] in sccs


def test_union_find_components():
    sg = SimpleGraph(nodes={i: b"A" for i in range(1, 6)},
                     edges={(1, 2), (2, 3), (3, 4), (3, 5)})
    comps = union_find_components(sg)
    # 3->4 and 3->5 break the chain at 3 (outdeg 2)
    chain = next(c for c in comps if 1 in c)
    assert chain == [1, 2, 3]


def test_compact_simple_merges_chain():
    """Legacy compaction (src/compaction.rs:258-425): a perfect linear
    chain merges into its first node's id with concatenated sequence,
    paths rewritten, internal edges dropped."""
    from gfasort_tpu.compat import compact_simple

    sg = SimpleGraph(
        nodes={1: b"AC", 2: b"GT", 3: b"TT", 4: b"A"},
        edges={(1, 2), (2, 3), (3, 4)},
        paths=[("p", [1, 2, 3, 4]), ("q", [1, 2, 3, 4])],
    )
    before = {n: b"".join(sg.nodes[i] for i in p) for n, p in sg.paths}
    merged = compact_simple(sg)
    assert merged == 3
    assert set(sg.nodes) == {1}
    assert sg.nodes[1] == b"ACGTTTA"
    assert sg.paths == [("p", [1]), ("q", [1])]
    assert sg.edges == set()
    after = {n: b"".join(sg.nodes[i] for i in p) for n, p in sg.paths}
    assert after == before


def test_compact_simple_respects_partial_path_use():
    """A node pair is NOT a perfect-neighbor pair when some path visits
    left without continuing to right (src/compaction.rs:21-64)."""
    from gfasort_tpu.compat import compact_simple

    sg = SimpleGraph(
        nodes={1: b"A", 2: b"C", 3: b"G"},
        edges={(1, 2), (2, 3)},
        paths=[("p", [1, 2, 3]), ("q", [2])],  # q ends at 2
    )
    merged = compact_simple(sg)
    # 1->2 merges (all visits to 1 continue to 2, visits(2)=2 != 1 ->
    # actually 1->2 fails: left_to_right(1) == 1 but right_visits == 2
    assert merged == 0
    assert set(sg.nodes) == {1, 2, 3}


def test_compact_simple_branch_blocks_merge():
    from gfasort_tpu.compat import compact_simple

    sg = SimpleGraph(
        nodes={1: b"A", 2: b"C", 3: b"G", 4: b"T"},
        edges={(1, 2), (2, 3), (2, 4)},
        paths=[("p", [1, 2, 3]), ("q", [1, 2, 4])],
    )
    merged = compact_simple(sg)
    # 1->2 is degree-eligible and perfect (all 1-visits go to 2,
    # visits(2)=2 == transitions), so 1,2 merge; 2's branch stops there
    assert merged == 1
    assert 3 in sg.nodes and 4 in sg.nodes
    assert sg.nodes[1] == b"AC"
    assert sg.paths[0] == ("p", [1, 3])
    assert (1, 3) in sg.edges and (1, 4) in sg.edges


def test_compact_simple_preserves_path_sequences_on_fixture(lil_gfa):
    from gfasort_tpu.compat import compact_simple

    g = gfa.parse_gfa_numeric(lil_gfa)
    sg = SimpleGraph.from_bidirected(g)
    before = {n: b"".join(sg.nodes[i] for i in p) for n, p in sg.paths}
    compact_simple(sg)
    after = {n: b"".join(sg.nodes.get(i, b"") for i in p) for n, p in sg.paths}
    assert after == before
