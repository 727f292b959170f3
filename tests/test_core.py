"""Core data model tests: handles, reverse complement, graph storage,
GFA I/O, path index.  Mirrors the reference's in-module unit tests
(src/graph.rs:201-259, src/graph_ops.rs:2051-2132,
src/gfa_parser.rs:186-209) plus SoA-specific checks."""

import numpy as np
import pytest

from gfasort_tpu import BiPath, BidirectedGraph, PathIndex
from gfasort_tpu import handle as H
from gfasort_tpu.io import gfa


# ---------------------------------------------------------------- handles
def test_handle_creation():
    h1 = H.forward(42)
    assert H.node_id(h1) == 42
    assert not H.is_reverse(h1)
    assert H.orientation_char(h1) == "+"
    h2 = H.reverse(42)
    assert H.node_id(h2) == 42
    assert H.is_reverse(h2)
    assert H.orientation_char(h2) == "-"


def test_handle_flip():
    h1 = H.forward(10)
    h2 = H.flip(h1)
    assert H.node_id(h2) == 10 and H.is_reverse(h2)
    assert H.flip(h2) == h1


def test_handle_vectorized():
    ids = np.array([1, 2, 3], dtype=np.int64)
    hs = H.encode(ids, np.array([0, 1, 0]))
    assert (H.node_id(hs) == ids).all()
    assert (H.is_reverse(hs) == [0, 1, 0]).all()
    assert (H.node_id(H.flip(hs)) == ids).all()


def test_reverse_complement():
    assert H.reverse_complement(b"ATCG") == b"CGAT"
    assert H.reverse_complement(b"AAAA") == b"TTTT"
    assert H.reverse_complement(b"GCTA") == b"TAGC"
    assert H.reverse_complement(b"N") == b"N"
    assert H.reverse_complement(b"atcgn") == b"NCGAT"
    assert H.reverse_complement(b"X") == b"X"  # unknown chars pass through


# ---------------------------------------------------------------- graph
def test_graph_creation_and_edge_dedup():
    g = BidirectedGraph()
    g.add_node(1, b"ATCG")
    g.add_node(2, b"GCTA")
    g.add_edge(H.forward(1), H.forward(2))
    g.add_edge(H.forward(1), H.reverse(2))
    assert g.node_count() == 2
    assert len(g.edges) == 2
    # complement of 1+ -> 2+ is 2- -> 1-: must be deduped
    g.add_edge(H.reverse(2), H.reverse(1))
    assert len(g.edges) == 2
    assert g.has_edge(H.forward(1), H.forward(2))
    assert g.has_edge(H.reverse(2), H.reverse(1))


def test_sequence_retrieval():
    g = BidirectedGraph()
    g.add_node(1, b"ATCG")
    assert g.get_sequence(H.forward(1)) == b"ATCG"
    assert g.get_sequence(H.reverse(1)) == b"CGAT"


def test_edges_from_to_complement_matching():
    g = BidirectedGraph()
    for i in (1, 2, 3):
        g.add_node(i, b"A")
    g.add_edge(H.forward(1), H.forward(2))
    g.add_edge(H.reverse(3), H.reverse(2))  # complement: 2+ -> 3+
    assert sorted(g.edges_from(H.forward(2))) == [H.forward(3)]
    assert sorted(g.edges_to(H.forward(2))) == [H.forward(1)]
    assert sorted(g.edges_from(H.forward(1))) == [H.forward(2)]


def test_path_sequence():
    g = BidirectedGraph()
    g.add_node(1, b"ATG")
    g.add_node(2, b"CGA")
    g.build_path("t", [(1, False), (2, True)])
    assert g.path_sequence(g.paths[0]) == b"ATGTCG"


def test_node_order_tracking():
    g = BidirectedGraph()
    g.add_node(5, b"A")
    g.add_node(2, b"C")
    g.add_node(5, b"G")  # overwrite: no new node_order entry
    assert g.node_order == [5, 2]


def test_apply_ordering_renumbers():
    g = BidirectedGraph()
    for i in (1, 2, 3):
        g.add_node(i, bytes([65 + i]) * i)
    g.add_edge(H.forward(1), H.forward(2))
    g.add_edge(H.forward(2), H.forward(3))
    g.build_path("p", [(1, False), (2, False), (3, False)])
    hashes = g.compute_all_path_hashes()
    # order 3,1,2 -> new ids 1,2,3
    g.apply_ordering([H.forward(3), H.forward(1), H.forward(2)])
    assert g.nodes[1] == b"D" * 3
    assert g.nodes[2] == b"B"
    assert g.nodes[3] == b"C" * 2
    assert g.ranks == {1: 0, 2: 1, 3: 2}
    assert [H.fmt(int(h)) for h in g.paths[0].steps] == ["2+", "3+", "1+"]
    assert g.validate_path_hashes(hashes)
    assert not g.validate_graph_consistency()


def test_renumber_sequentially():
    g = BidirectedGraph()
    g.add_node(10, b"A")
    g.add_node(20, b"C")
    g.add_edge(H.forward(10), H.forward(20))
    g.build_path("p", [(10, False), (20, False)])
    g.renumber_nodes_sequentially()
    assert g.live_node_ids() == [1, 2]
    assert (1 << 1, 2 << 1) in g.edges


def test_verify_path_edges_adds_missing():
    g = BidirectedGraph()
    g.add_node(1, b"A")
    g.add_node(2, b"C")
    g.build_path("p", [(1, False), (2, False)])
    assert g.verify_path_edges() == 1
    assert g.has_edge(H.forward(1), H.forward(2))
    assert g.verify_path_edges() == 0


# ---------------------------------------------------------------- GFA I/O
def test_gfa_output_strings():
    g = BidirectedGraph()
    g.add_node(1, b"ATCG")
    g.add_node(2, b"GCTA")
    g.add_edge(H.forward(1), H.reverse(2))
    g.build_path("path1", [(1, False), (2, True)])
    text = gfa.write_gfa(g)
    assert "S\t1\tATCG" in text
    assert "S\t2\tGCTA" in text
    assert "L\t1\t+\t2\t-\t0M" in text
    assert "P\tpath1\t1+,2-\t*" in text


def test_parse_numeric_roundtrip(simple_gfa):
    g = gfa.parse_gfa_numeric(simple_gfa)
    assert g.node_count() == 15
    assert len(g.edges) == 20
    assert len(g.paths) == 1
    assert g.node_order == list(range(1, 16))
    text = gfa.write_gfa(g)
    g2 = gfa.parse_gfa_numeric(text)
    assert g2.node_count() == 15
    assert g2.edges == g.edges
    assert gfa.canonical_gfa(g) == gfa.canonical_gfa(g2)


def test_parse_named(simple_gfa):
    g = gfa.parse_gfa_named(simple_gfa)
    assert g.node_count() == 15
    assert len(g.edges) == 20


def test_lil_gfa_paths(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    assert g.node_count() == 15
    assert len(g.paths) == 3


def test_drb1_counts(drb1_gfa):
    g = gfa.parse_gfa_numeric(drb1_gfa)
    assert g.node_count() == 4955
    assert len(g.paths) == 12


# ---------------------------------------------------------------- PathIndex
def test_path_index_simple(simple_gfa):
    g = gfa.parse_gfa_numeric(simple_gfa)
    pidx = PathIndex.from_graph(g)
    assert pidx.num_paths == 1
    assert pidx.total_steps == len(g.paths[0])
    # position of step k = cumulative bp of steps 0..k-1
    assert pidx.step_pos[0] == 0
    seq0 = g.get_sequence(int(g.paths[0].steps[0]))
    assert pidx.step_pos[1] == len(seq0)
    # path length = sum of oriented node lengths
    assert pidx.path_len[0] == len(g.path_sequence(g.paths[0]))
    # node indexing follows node_order
    assert pidx.node_ids.tolist() == g.node_order
    x0 = pidx.initial_positions()
    assert x0[0] == 0
    assert x0[1] == len(g.nodes[g.node_order[0]])


def test_path_index_stats(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    assert pidx.sum_path_step_count == sum(len(p) for p in g.paths)
    assert pidx.max_path_step_count == max(len(p) for p in g.paths)
    assert pidx.has_multi_step_path()
    # step_node_idx gathers the dense index of each step's node
    for s in range(pidx.total_steps):
        nid = int(pidx.step_handle[s]) >> 1
        assert pidx.step_node_idx[s] == pidx.handle_to_idx[nid]


def test_path_index_empty():
    g = BidirectedGraph()
    pidx = PathIndex.from_graph(g)
    assert pidx.total_steps == 0
    assert pidx.num_paths == 0
    assert not pidx.has_multi_step_path()


# ---------------------------------------------------------------- params
def test_params_defaults_and_derivation(simple_gfa):
    from gfasort_tpu import PathSGDParams, YgsParams

    p = PathSGDParams()
    assert p.iter_max == 100
    assert p.theta == 0.99
    assert p.eps == 0.01
    assert p.seed == 9399220
    assert p.space_quantization_step == 100
    assert p.first_cooling_iteration == 50

    g = gfa.parse_gfa_numeric(simple_gfa)
    yp = YgsParams.from_graph(g, 0, 1)
    pidx = PathIndex.from_graph(g)
    assert yp.path_sgd.min_term_updates == pidx.sum_path_step_count
    assert yp.path_sgd.eta_max == float(pidx.max_path_step_count ** 2)
    assert yp.path_sgd.space == pidx.max_path_length


def test_layout_params_derivation(lil_gfa):
    from gfasort_tpu import LayoutSGDParams

    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    lp = LayoutSGDParams().derive_from_graph(pidx, dimensions=3)
    assert lp.dimensions == 3
    assert lp.iter_max == 30
    assert lp.min_term_updates == 10 * pidx.sum_path_step_count
    assert lp.space == pidx.max_path_step_count
    assert lp.space_max == 1000


# ---------------------------------------------------------------- Layout
def test_layout_roundtrip():
    from gfasort_tpu import Layout

    lay = Layout(2, 3)
    vals = np.arange(12, dtype=np.float64).reshape(3, 2, 2) * 1.5
    lay.coords[:] = vals
    text = lay.write_tsv()
    loaded = Layout.read_tsv(text)
    assert loaded.dimensions == 2
    assert loaded.num_nodes == 3
    np.testing.assert_allclose(loaded.coords, lay.coords)


def test_layout_from_vectors():
    from gfasort_tpu import Layout

    x = [1.0, 2.0, 3.0, 4.0]
    y = [10.0, 20.0, 30.0, 40.0]
    lay = Layout.from_vectors([np.array(x), np.array(y)])
    assert lay.num_nodes == 2 and lay.dimensions == 2
    assert lay.x_plus(0) == 1.0 and lay.y_plus(0) == 10.0
    assert lay.x_minus(0) == 2.0 and lay.y_minus(0) == 20.0
    assert lay.x_plus(1) == 3.0


def test_layout_distance():
    from gfasort_tpu import Layout

    lay = Layout(2, 2)
    lay.set(1, 0, 0, 3.0)
    lay.set(1, 0, 1, 4.0)
    assert lay.distance(0, 0, 1, 0) == pytest.approx(5.0)


def test_layout_state_roundtrip():
    from gfasort_tpu import Layout

    state = np.random.default_rng(0).normal(size=(6, 3))
    lay = Layout.from_state(state)
    np.testing.assert_allclose(lay.to_state(), state)


def test_sgd_node_ids_stale_node_order_fallback():
    """Gapped-id graph + renumbering: node_order goes stale and covers
    only part of the graph; sgd_node_ids must fall back to live ids
    (the reference would silently drop the uncovered nodes)."""
    from gfasort_tpu.index import sgd_node_ids

    g = BidirectedGraph()
    for nid in (1, 2, 10001, 10002):  # gapped ids
        g.add_node(nid, b"ACGT")
    g.add_edge(H.forward(1), H.forward(2))
    g.add_edge(H.forward(10001), H.forward(10002))
    g.build_path("p", [(1, False), (2, False)])
    g.build_path("q", [(10001, False), (10002, False)])
    assert sgd_node_ids(g) == [1, 2, 10001, 10002]
    # renumber to 1..4 -> node_order now covers only {1, 2}
    g.apply_ordering([H.forward(i) for i in (1, 2, 10001, 10002)])
    ids = sgd_node_ids(g)
    assert sorted(ids) == [1, 2, 3, 4]
    pidx = PathIndex.from_graph(g)
    assert pidx.num_nodes == 4
    assert (pidx.step_node_idx >= 0).all()
