"""Host graph algorithm tests: topological sorts, grooming, unchop.

Beyond invariant checks on the reference fixtures, these tests include
*naive replicas*: direct quadratic transcriptions of the reference
pseudocode (full edge-set rescans, exactly as gfasort does it) that are
compared against the production O(E) implementations on randomized
bidirected graphs.  Agreement on hundreds of random graphs is the
parity evidence standing in for reference goldens (no Rust toolchain in
this environment, see BASELINE.md)."""

import random

import numpy as np
import pytest

from gfasort_tpu import BidirectedGraph
from gfasort_tpu import handle as H
from gfasort_tpu.algos import (
    apply_grooming_with_reorder,
    compact,
    exact_odgi_topological_order,
    find_head_nodes,
    find_tail_nodes,
    groom,
    groom_with_mode,
    local_topological_refinement,
    priority_topological_order,
)
from gfasort_tpu.io import gfa


# ---------------------------------------------------------------- helpers
def linear_graph(n=3):
    g = BidirectedGraph()
    for i in range(1, n + 1):
        g.add_node(i, b"ACGT"[: (i % 4) + 1] * i)
    for i in range(1, n):
        g.add_edge(H.forward(i), H.forward(i + 1))
    g.build_path("p", [(i, False) for i in range(1, n + 1)])
    return g


def random_graph(rng: random.Random, n_nodes=8, n_edges=12, n_paths=2):
    g = BidirectedGraph()
    for i in range(1, n_nodes + 1):
        g.add_node(i, bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 5))))
    for _ in range(n_edges):
        a = rng.randint(1, n_nodes)
        b = rng.randint(1, n_nodes)
        g.add_edge(
            H.encode(a, rng.randint(0, 1)), H.encode(b, rng.randint(0, 1))
        )
    for p in range(n_paths):
        steps = []
        for _ in range(rng.randint(2, 6)):
            steps.append((rng.randint(1, n_nodes), bool(rng.randint(0, 1))))
        g.build_path(f"p{p}", steps)
    return g


# ------------------------------------------------------- naive replicas
def naive_edge_goes_to(e, h):
    return e[1] == h or e[0] == H.flip(h)


def naive_edge_goes_from(e, h):
    return e[0] == h or e[1] == H.flip(h)


def naive_next_handle(e, h):
    return e[1] if e[0] == h else H.flip(e[0])


def naive_exact_odgi(graph, use_heads=True, use_tails=False):
    """Direct transcription of src/graph_ops.rs:1232-1485 with full
    edge rescans."""
    live = graph.live_node_ids()
    if not live:
        return []
    sorted_out = []
    s = set()
    visited_nodes = set()
    unvisited = set()
    for nid in live:
        unvisited.add(H.forward(nid))
        unvisited.add(H.reverse(nid))
    seeds = []
    masked = set()
    edges_vec = sorted(graph.edges)

    def enqueue(h):
        s.add(h)
        unvisited.discard(h)
        unvisited.discard(H.flip(h))

    if use_heads:
        for h in find_head_nodes(graph):
            enqueue(h)
    elif use_tails:
        for h in find_tail_nodes(graph):
            enqueue(h)

    while unvisited or s:
        if not s:
            while seeds and not s:
                seeds.sort()
                h = seeds.pop(0)
                if h in unvisited:
                    enqueue(h)
            if not s and unvisited:
                enqueue(min(unvisited))
        while s:
            handle = min(s)
            s.discard(handle)
            fwd = H.forward(H.node_id(handle))
            if H.node_id(handle) not in visited_nodes:
                visited_nodes.add(H.node_id(handle))
                sorted_out.append(fwd)
            for e in edges_vec:
                if naive_edge_goes_to(e, fwd) and e not in masked:
                    src = (
                        H.node_id(e[0]) if e[1] == fwd else H.node_id(H.flip(e[1]))
                    )
                    sf = H.forward(src)
                    if sf not in unvisited and H.flip(sf) not in unvisited:
                        masked.add(e)
            for e in edges_vec:
                if naive_edge_goes_from(e, fwd) and e not in masked:
                    masked.add(e)
                    nxt = naive_next_handle(e, fwd)
                    if nxt in unvisited:
                        has_in = any(
                            naive_edge_goes_to(o, nxt) and o not in masked
                            for o in edges_vec
                        )
                        if not has_in:
                            enqueue(nxt)
                        elif nxt not in seeds:
                            seeds.append(nxt)
    return sorted_out


def naive_groom_bfs(graph):
    """Direct transcription of src/groom.rs:56-198 (BFS mode)."""
    from collections import deque

    seeds = find_head_nodes(graph)
    live = graph.live_node_ids()
    if not seeds:
        seeds = [H.forward(min(live))] if live else []
    visited, flipped = set(), set()
    current = seeds
    while len(visited) < len(live) or current:
        if not current:
            nxt = next((n for n in live if n not in visited), None)
            if nxt is None:
                break
            current = [H.forward(nxt)]
        queue = deque()
        for seed in current:
            if H.node_id(seed) not in visited:
                queue.append(seed)
                visited.add(H.node_id(seed))
                if H.is_reverse(seed):
                    flipped.add(H.node_id(seed))
        while queue:
            cur = queue.popleft()
            nxts = []
            for e in graph.edges:
                if e[0] == cur:
                    nxts.append(e[1])
                elif H.flip(e[1]) == cur:
                    nxts.append(H.flip(e[0]))
            nxts.sort()
            for nx in nxts:
                if H.node_id(nx) not in visited:
                    visited.add(H.node_id(nx))
                    if H.is_reverse(nx):
                        flipped.add(H.node_id(nx))
                    queue.append(nx)
        current = []
    return [
        H.reverse(n) if n in flipped else H.forward(n) for n in sorted(live)
    ]


# ---------------------------------------------------------------- tests
def test_heads_tails_linear():
    g = linear_graph(3)
    assert find_head_nodes(g) == [H.forward(1)]
    assert find_tail_nodes(g) == [H.forward(3)]


def test_heads_complement_form():
    # Edge stored as complement: 2- -> 1-  means 1+ -> 2+, so node 2 has
    # a left incoming edge and is NOT a head.
    g = BidirectedGraph()
    g.add_node(1, b"A")
    g.add_node(2, b"C")
    g.edges.add((H.reverse(2), H.reverse(1)))
    assert find_head_nodes(g) == [H.forward(1)]


def test_topo_linear_and_invariants():
    g = linear_graph(5)
    order = exact_odgi_topological_order(g)
    assert order == [H.forward(i) for i in range(1, 6)]


def test_topo_emits_each_node_once(simple_gfa):
    g = gfa.parse_gfa_numeric(simple_gfa)
    order = exact_odgi_topological_order(g)
    ids = [H.node_id(h) for h in order]
    assert sorted(ids) == g.live_node_ids()
    assert all(not H.is_reverse(h) for h in order)


def test_topo_matches_naive_on_fixtures(simple_gfa, lil_gfa):
    for text in (simple_gfa, lil_gfa):
        g = gfa.parse_gfa_numeric(text)
        assert exact_odgi_topological_order(g) == naive_exact_odgi(g)


def test_topo_matches_naive_randomized():
    rng = random.Random(7)
    for trial in range(150):
        g = random_graph(rng)
        fast = exact_odgi_topological_order(g)
        slow = naive_exact_odgi(g)
        assert fast == slow, f"trial {trial}: {fast} != {slow}"


def test_topo_tails_mode_randomized():
    rng = random.Random(11)
    for _ in range(50):
        g = random_graph(rng)
        assert exact_odgi_topological_order(
            g, use_heads=False, use_tails=True
        ) == naive_exact_odgi(g, use_heads=False, use_tails=True)


def test_groom_matches_naive_randomized():
    rng = random.Random(13)
    for trial in range(150):
        g = random_graph(rng)
        assert groom(g) == naive_groom_bfs(g), f"trial {trial}"


def test_groom_flips_inverted_node():
    # 1+ -> 2- -> 3+ chain: BFS reaches 2 via reverse, flips it.
    g = BidirectedGraph()
    for i in (1, 2, 3):
        g.add_node(i, b"ACG")
    g.add_edge(H.forward(1), H.reverse(2))
    g.add_edge(H.reverse(2), H.forward(3))
    g.build_path("p", [(1, False), (2, True), (3, False)])
    order = groom(g)
    assert order == [H.forward(1), H.reverse(2), H.forward(3)]
    hashes = g.compute_all_path_hashes()
    apply_grooming_with_reorder(g, order, reorder=True)
    # sequences/orientations flipped but path DNA unchanged
    assert g.validate_path_hashes(hashes)
    # after grooming all path steps forward
    assert all((g.paths[0].steps & 1) == 0)


def test_groom_preserves_path_hashes(simple_gfa, lil_gfa):
    for text in (simple_gfa, lil_gfa):
        g = gfa.parse_gfa_numeric(text)
        hashes = g.compute_all_path_hashes()
        n, e = g.node_count(), len(g.edges)
        apply_grooming_with_reorder(g, groom(g), reorder=True)
        assert g.validate_path_hashes(hashes)
        assert g.node_count() == n and len(g.edges) == e
        assert not g.validate_graph_consistency()


def test_groom_modes_run(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    for kw in (
        dict(use_bfs=True),
        dict(use_bfs=False),
        dict(use_bfs=False, use_coverage_dfs=True),
    ):
        order = groom_with_mode(g.clone(), **kw)
        assert len(order) == g.node_count()


def test_priority_topo_linear():
    g = linear_graph(4)
    order = priority_topological_order(g, [1, 2, 3, 4])
    assert order == [H.forward(i) for i in range(1, 5)]


def test_priority_topo_reverse_mode():
    # all edges backward (high id -> low id) triggers reverse mode
    g = BidirectedGraph()
    for i in (1, 2, 3, 4):
        g.add_node(i, b"A")
    for i in (4, 3, 2):
        g.add_edge(H.forward(i), H.forward(i - 1))
    g.build_path("p", [(4, False), (3, False), (2, False), (1, False)])
    order = priority_topological_order(g, [4, 3, 2, 1])
    ids = [H.node_id(h) for h in order]
    assert sorted(ids) == [1, 2, 3, 4]


def test_unchop_merges_linear_chain():
    g = linear_graph(3)
    seq_before = g.path_sequence(g.paths[0])
    compact(g)
    assert g.node_count() == 1
    nid = g.live_node_ids()[0]
    assert g.nodes[nid] == seq_before
    assert len(g.paths[0]) == 1
    assert g.path_sequence(g.paths[0]) == seq_before
    g.renumber_nodes_sequentially()
    assert g.live_node_ids() == [1]


def test_unchop_respects_branch():
    # 1 -> 2 -> 3 and 1 -> 3: only 2 has in/out degree 1, but 1 has
    # out-degree 2 so chain {2,3} may merge, 1 stays.
    g = BidirectedGraph()
    for i in (1, 2, 3):
        g.add_node(i, b"AC")
    g.add_edge(H.forward(1), H.forward(2))
    g.add_edge(H.forward(2), H.forward(3))
    g.add_edge(H.forward(1), H.forward(3))
    g.build_path("p", [(1, False), (2, False), (3, False)])
    g.build_path("q", [(1, False), (3, False)])
    hashes = g.compute_all_path_hashes()
    compact(g)
    # node 3 has in-degree 2 (from 2 and from 1) so nothing merges
    assert g.node_count() == 3
    assert g.validate_path_hashes(hashes)


def test_unchop_reverse_chain_in_path():
    # path traverses the chain in reverse orientation
    g = BidirectedGraph()
    for i in (1, 2):
        g.add_node(i, b"ACGT")
    g.add_edge(H.forward(1), H.forward(2))
    g.build_path("f", [(1, False), (2, False)])
    g.build_path("r", [(2, True), (1, True)])
    hashes = g.compute_all_path_hashes()
    compact(g)
    assert g.node_count() == 1
    assert g.validate_path_hashes(hashes)
    assert len(g.paths[0]) == 1 and len(g.paths[1]) == 1
    assert H.is_reverse(int(g.paths[1].steps[0]))


def test_unchop_aborts_on_partial_chain_use():
    # path q uses node 2 without completing the chain 1->2: no merge
    g = BidirectedGraph()
    for i in (1, 2):
        g.add_node(i, b"AC")
    g.add_edge(H.forward(1), H.forward(2))
    g.build_path("p", [(1, False), (2, False)])
    g.build_path("q", [(2, False)])
    compact(g)
    assert g.node_count() == 2


def test_unchop_fixture_preserves_sequences(simple_gfa, lil_gfa, drb1_gfa):
    for text in (simple_gfa, lil_gfa, drb1_gfa):
        g = gfa.parse_gfa_numeric(text)
        hashes = g.compute_all_path_hashes()
        before = g.node_count()
        compact(g)
        g.renumber_nodes_sequentially()
        assert g.node_count() <= before
        assert g.validate_path_hashes(hashes)
        assert not g.validate_graph_consistency()


def test_local_refinement_fixes_short_backward_edge():
    g = BidirectedGraph()
    for i in (1, 2, 3):
        g.add_node(i, b"A")
    g.add_edge(H.forward(3), H.forward(2))  # backward in order [1,2,3]... 3->2
    order = local_topological_refinement(g, [1, 2, 3], max_distance=5)
    ids = [H.node_id(h) for h in order]
    assert sorted(ids) == [1, 2, 3]
    pos = {nid: i for i, nid in enumerate(ids)}
    assert pos[3] < pos[2]  # backward edge fixed


# ------------------------------------------------- native (C++) parity
def _native_available():
    from gfasort_tpu.native import available

    return available()


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_topo_matches_python_randomized():
    from gfasort_tpu.algos.native_dispatch import native_topo

    rng = random.Random(404)
    for trial in range(150):
        g = random_graph(
            rng,
            n_nodes=rng.randint(2, 40),
            n_edges=rng.randint(1, 80),
            n_paths=rng.randint(0, 4),
        )
        for use_heads, use_tails in ((True, False), (False, True), (False, False)):
            want = naive_exact_odgi(g, use_heads, use_tails)
            got = native_topo(g, use_heads, use_tails)
            assert got == want, f"trial {trial} heads={use_heads} tails={use_tails}"


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_groom_matches_python_randomized():
    from gfasort_tpu.algos.native_dispatch import native_groom

    rng = random.Random(405)
    for trial in range(150):
        g = random_graph(
            rng,
            n_nodes=rng.randint(2, 40),
            n_edges=rng.randint(1, 80),
            n_paths=rng.randint(0, 4),
        )
        # BFS vs the naive reference transcription; DFS vs the Python
        # implementation (random graphs are below the dispatch
        # threshold, so groom_with_mode stays pure-Python here)
        assert native_groom(g, True) == naive_groom_bfs(g), f"trial {trial} bfs"
        assert native_groom(g, False) == groom_with_mode(g, use_bfs=False), (
            f"trial {trial} dfs"
        )


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_dispatch_on_fixture(drb1_gfa):
    """DRB1 has >2048 edges, so the public functions dispatch to C++;
    force the Python path and compare."""
    from gfasort_tpu.algos import native_dispatch

    g = gfa.parse_gfa_numeric(drb1_gfa)
    got_topo = exact_odgi_topological_order(g, True, False)
    got_groom = groom(g)

    import unittest.mock as mock

    with mock.patch.object(native_dispatch, "native_topo", lambda *a: None), \
         mock.patch.object(native_dispatch, "native_groom", lambda *a: None):
        want_topo = exact_odgi_topological_order(g, True, False)
        want_groom = groom(g)
    assert got_topo == want_topo
    assert got_groom == want_groom


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_simple_components_matches_python_randomized():
    from gfasort_tpu.algos import unchop as unchop_mod
    from gfasort_tpu.algos.native_dispatch import native_simple_components

    rng = random.Random(406)
    for trial in range(200):
        g = random_graph(
            rng,
            n_nodes=rng.randint(2, 30),
            n_edges=rng.randint(1, 50),
            n_paths=rng.randint(0, 4),
        )
        # long linear runs make real chains likely
        for i in range(1, rng.randint(2, 20)):
            g.add_edge(H.forward(i), H.forward(i + 1))
        import unittest.mock as mock

        with mock.patch.object(
            unchop_mod, "find_simple_components",
            wraps=unchop_mod.find_simple_components,
        ):
            pass
        want = _python_simple_components(g)
        got = native_simple_components(g)
        assert got == want, f"trial {trial}"


def _python_simple_components(g):
    """Force the pure-Python component finder (below dispatch threshold
    anyway, but explicit)."""
    import gfasort_tpu.algos.native_dispatch as nd
    import unittest.mock as mock

    from gfasort_tpu.algos.unchop import find_simple_components

    with mock.patch.object(nd, "native_simple_components", lambda g: None):
        return find_simple_components(g)


def _sequential_compact(g):
    """The pre-batching fixpoint loop: one merge_component call per
    chain (reference structure, src/graph_ops.rs:104-125)."""
    from gfasort_tpu.algos.unchop import find_simple_components, merge_component

    while True:
        compacted = False
        for component in find_simple_components(g):
            if len(component) >= 2 and merge_component(g, component):
                compacted = True
        if not compacted:
            break


def test_batched_compact_matches_sequential_randomized():
    rng = random.Random(511)
    for trial in range(120):
        g = random_graph(
            rng,
            n_nodes=rng.randint(3, 25),
            n_edges=rng.randint(2, 30),
            n_paths=rng.randint(1, 4),
        )
        # seed linear runs so chains exist (over existing nodes only: a
        # dangling path step with id == len(nodes) would be captured by
        # the merged node, changing the path hash — faithful to the
        # reference's new_id = nodes.len(), src/graph_ops.rs:500-502,
        # but not what this test is about)
        run = rng.randint(2, min(12, len(g.nodes) - 1))
        for i in range(1, run):
            g.add_edge(H.forward(i), H.forward(i + 1))
        g.build_path("lin", [(i, False) for i in range(1, run + 1)])
        g1, g2 = g.clone(), g.clone()
        compact(g1)              # batched production path
        _sequential_compact(g2)  # reference-structured sequential
        assert g1.nodes == g2.nodes, f"trial {trial}: nodes differ"
        assert g1.edges == g2.edges, f"trial {trial}: edges differ"
        assert g1.node_order == g2.node_order, f"trial {trial}: order differs"
        for p1, p2 in zip(g1.paths, g2.paths):
            assert np.array_equal(p1.steps, p2.steps), f"trial {trial}: path {p1.name}"
        assert g1.compute_all_path_hashes() == g.compute_all_path_hashes()


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_priority_topo_matches_python_randomized():
    from gfasort_tpu.algos.native_dispatch import native_priority_topo

    rng = random.Random(407)
    for trial in range(150):
        g = random_graph(
            rng,
            n_nodes=rng.randint(2, 40),
            n_edges=rng.randint(1, 80),
            n_paths=rng.randint(0, 3),
        )
        live = g.live_node_ids()
        prio = list(live)
        rng.shuffle(prio)
        if rng.random() < 0.3:
            prio = prio[: len(prio) // 2]  # partial priority: max_rank ties
        for use_heads in (True, False):
            for rev in (False, True):
                want = priority_topological_order(g, prio, use_heads, rev)
                got = native_priority_topo(g, prio, use_heads, rev)
                assert got == want, (
                    f"trial {trial} heads={use_heads} rev={rev}"
                )
