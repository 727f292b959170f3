"""Legacy orientation-less graph compatibility layer.

Rebuild of the reference's legacy ``Graph`` surface (gfasort
``src/legacy_graph_ops.rs`` + ``src/compaction.rs``; SURVEY.md §2 rows
27-28).  The reference keeps this layer only for back-compat — it is
unreachable from the CLI pipeline — but its API (orientation-less graph,
converters, simple topo sort, Tarjan SCC, union-find compaction) is part
of the library surface, so an equivalent is provided.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Set, Tuple

from . import handle as H
from .graph import BiPath, BidirectedGraph

__all__ = ["SimpleGraph", "tarjan_scc", "union_find_components", "compact_simple"]


@dataclass
class SimpleGraph:
    """Orientation-less graph: nodes by id, directed edges, paths as
    node-id lists (legacy Graph, src/legacy_graph_ops.rs)."""

    nodes: Dict[int, bytes] = field(default_factory=dict)
    edges: Set[Tuple[int, int]] = field(default_factory=set)
    paths: List[Tuple[str, List[int]]] = field(default_factory=list)

    # -- converters (src/graph_ops.rs:540-610) -------------------------
    @classmethod
    def from_bidirected(cls, g: BidirectedGraph) -> "SimpleGraph":
        """Keep only forward-to-forward edges, drop orientations."""
        sg = cls()
        for nid, seq in enumerate(g.nodes):
            if seq is not None:
                sg.nodes[nid] = seq
        for f, t in g.edges:
            if not H.is_reverse(f) and not H.is_reverse(t):
                sg.edges.add((H.node_id(f), H.node_id(t)))
        for path in g.paths:
            sg.paths.append((path.name, [int(h) >> 1 for h in path.steps]))
        return sg

    def to_bidirected(self) -> BidirectedGraph:
        """All nodes forward; paths become forward-step paths."""
        g = BidirectedGraph()
        for nid, seq in sorted(self.nodes.items()):
            g.add_node(nid, seq)
        for a, b in self.edges:
            g.add_edge(H.forward(a), H.forward(b))
        for name, ids in self.paths:
            g.paths.append(BiPath(name, [H.forward(i) for i in ids]))
        return g

    # -- simple topological sort (legacy variant) ----------------------
    def topological_sort(self) -> List[int]:
        """Kahn's algorithm with lowest-id tie-breaking; cycles broken
        at the minimum-id remaining node."""
        import heapq

        indeg: Dict[int, int] = {n: 0 for n in self.nodes}
        succ: Dict[int, List[int]] = {n: [] for n in self.nodes}
        for a, b in self.edges:
            if a in indeg and b in indeg:
                succ[a].append(b)
                indeg[b] += 1
        ready = [n for n, d in indeg.items() if d == 0]
        heapq.heapify(ready)
        remaining = set(self.nodes)
        out: List[int] = []
        while remaining:
            if not ready:
                seed = min(remaining)
                indeg[seed] = 0
                heapq.heappush(ready, seed)
            n = heapq.heappop(ready)
            if n not in remaining:
                continue
            remaining.discard(n)
            out.append(n)
            for m in sorted(succ.get(n, ())):
                if m in remaining:
                    indeg[m] -= 1
                    if indeg[m] <= 0:
                        heapq.heappush(ready, m)
        return out


def tarjan_scc(graph: SimpleGraph) -> List[List[int]]:
    """Tarjan strongly-connected components (iterative;
    src/legacy_graph_ops.rs:349-430)."""
    succ: Dict[int, List[int]] = {n: [] for n in graph.nodes}
    for a, b in graph.edges:
        if a in succ and b in succ:
            succ[a].append(b)
    index: Dict[int, int] = {}
    lowlink: Dict[int, int] = {}
    on_stack: Set[int] = set()
    stack: List[int] = []
    sccs: List[List[int]] = []
    counter = [0]

    for root in sorted(graph.nodes):
        if root in index:
            continue
        work = [(root, iter(sorted(succ[root])))]
        index[root] = lowlink[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = lowlink[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(sorted(succ[w]))))
                    advanced = True
                    break
                elif w in on_stack:
                    lowlink[v] = min(lowlink[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                lowlink[pv] = min(lowlink[pv], lowlink[v])
            if lowlink[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(sorted(comp))
    return sccs


def compact_simple(graph: SimpleGraph) -> int:
    """ODGI-style compaction on the legacy graph with path-sequence
    preservation (src/compaction.rs:258-425): merge union-find chain
    components whose every path usage is a complete run; returns the
    number of merges.  Delegates to the bidirected compactor, which
    implements exactly those validations."""
    from .algos.unchop import compact as _compact

    g = graph.to_bidirected()
    before = g.node_count()
    _compact(g)
    g.renumber_nodes_sequentially()
    merged = SimpleGraph.from_bidirected(g)
    graph.nodes = merged.nodes
    graph.edges = merged.edges
    graph.paths = merged.paths
    return before - g.node_count()


def union_find_components(graph: SimpleGraph) -> List[List[int]]:
    """Union-find linear-chain components for legacy compaction
    (src/compaction.rs:66-124): nodes joined when connected by an edge
    that is the unique out-edge of its source and unique in-edge of its
    target."""
    outdeg: Dict[int, int] = {}
    indeg: Dict[int, int] = {}
    for a, b in graph.edges:
        outdeg[a] = outdeg.get(a, 0) + 1
        indeg[b] = indeg.get(b, 0) + 1

    parent: Dict[int, int] = {n: n for n in graph.nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(graph.edges):
        if outdeg.get(a) == 1 and indeg.get(b) == 1 and a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    comps: Dict[int, List[int]] = {}
    for n in graph.nodes:
        comps.setdefault(find(n), []).append(n)
    return [sorted(v) for _, v in sorted(comps.items()) if len(v) >= 1]
