"""Unchop: merge linear handle-chains into single nodes.

Reproduces the reference compaction (gfasort
``src/graph_ops.rs:104-498``): ``compact`` loops to fixpoint; each round
finds simple components — maximal handle chains where every step has
out-degree 1 / in-degree 1 in the doubled (direct + implied-reverse)
adjacency AND passes the perfect-neighbor path test in both orientations
— then merges each chain into a fresh node (id = ``len(nodes)``),
validating that every path contains chain handles only as complete
forward or reverse runs before mutating.

The reference's ``are_perfect_neighbors`` rescans every path per
candidate pair (O(chains · steps)); here the path-successor structure is
precomputed once per round: ``succ_ok[h]`` is the unique handle that
always follows ``h`` across all paths (absent if ``h`` never occurs;
None if occurrences conflict or any occurrence ends a path), which gives
the same predicate in O(1) per pair.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import handle as H

__all__ = ["compact", "find_simple_components", "merge_component"]

_CONFLICT = object()


def _path_successor_map(graph) -> Dict[int, object]:
    """h -> unique successor handle across all path occurrences, or
    _CONFLICT if occurrences disagree / any occurrence is path-final.

    Encodes exactly the reference predicate (src/graph_ops.rs:155-214):
    ``are_perfect_neighbors(from, to)`` is
    ``succ.get(from) in (absent, to) and succ.get(flip(to)) in (absent,
    flip(from))`` where absent = never occurs.
    """
    succ: Dict[int, object] = {}
    for path in graph.paths:
        steps = path.steps.tolist()
        for i, h in enumerate(steps):
            nxt = steps[i + 1] if i + 1 < len(steps) else _CONFLICT
            cur = succ.get(h)
            if cur is None:
                succ[h] = nxt
            elif cur is not nxt and cur != nxt:
                succ[h] = _CONFLICT
    return succ


def find_simple_components(graph) -> List[List[int]]:
    """Maximal mergeable chains (src/graph_ops.rs:128-287).  Scans
    handles in id order (forward then reverse per node), extending a
    chain while the doubled adjacency stays 1-in/1-out and the path
    test passes."""
    if len(graph.edges) >= 2048:
        from .native_dispatch import native_simple_components

        out = native_simple_components(graph)
        if out is not None:
            return out

    # Doubled adjacency (direct + implied reverse) (:139-152).
    fwd: Dict[int, List[int]] = {}
    bwd: Dict[int, List[int]] = {}
    for f, t in graph.edges:
        fwd.setdefault(f, []).append(t)
        bwd.setdefault(t, []).append(f)
        fwd.setdefault(H.flip(t), []).append(H.flip(f))
        bwd.setdefault(H.flip(f), []).append(H.flip(t))

    succ = _path_successor_map(graph)

    def perfect(a: int, b: int) -> bool:
        sa = succ.get(a)
        if sa is _CONFLICT or (sa is not None and sa != b):
            return False
        sb = succ.get(H.flip(b))
        if sb is _CONFLICT or (sb is not None and sb != H.flip(a)):
            return False
        return True

    components: List[List[int]] = []
    visited = set()
    merged_nodes = set()

    for nid in graph.live_node_ids():
        for handle in (H.forward(nid), H.reverse(nid)):
            if handle in visited:
                continue
            nexts = fwd.get(handle, ())
            if len(nexts) != 1:
                continue
            chain = [handle]
            visited.add(handle)
            current = handle
            while True:
                nexts = fwd.get(current, ())
                if len(nexts) != 1:
                    break
                nxt = nexts[0]
                if len(bwd.get(nxt, ())) != 1 or nxt in visited:
                    break
                if not perfect(current, nxt):
                    break
                chain.append(nxt)
                visited.add(nxt)
                current = nxt
                if len(fwd.get(nxt, ())) != 1:
                    break
            if len(chain) >= 2:
                if not any(H.node_id(h) in merged_nodes for h in chain):
                    merged_nodes.update(H.node_id(h) for h in chain)
                    components.append(chain)
    return components


def _match_starts(steps: np.ndarray, chain: np.ndarray) -> np.ndarray:
    """Start indices where ``chain`` occurs completely in ``steps``."""
    k, n = len(chain), len(steps)
    starts = np.flatnonzero(steps == chain[0])
    starts = starts[starts + k <= n]
    ok = np.ones(len(starts), dtype=bool)
    for j in range(1, k):
        ok &= steps[starts + j] == chain[j]
    return starts[ok]


def _plan_path_rewrite(
    steps: np.ndarray, chain: np.ndarray, rev_chain: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Validate + plan the rewrite of one path: returns
    (forward_run_starts, reverse_run_starts) of the reference's greedy
    left-to-right scan (src/graph_ops.rs:330-427, forward preferred),
    or None if a chain handle occurs outside a complete run."""
    member = np.isin(steps, chain) | np.isin(steps, rev_chain)
    if not member.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z
    f_starts = _match_starts(steps, chain)
    r_starts = _match_starts(steps, rev_chain)
    k = len(chain)
    if not set(chain.tolist()) & set(rev_chain.tolist()):
        # Disjoint handle sets: runs cannot overlap (chain handles are
        # unique), the vectorized result equals the greedy scan.
        covered = np.zeros(len(steps), dtype=bool)
        for s in np.concatenate([f_starts, r_starts]).tolist():
            covered[s : s + k] = True
        if (member & ~covered).any():
            return None
        return f_starts, r_starts
    # Hairpin chain (contains both orientations of some node): runs may
    # overlap — replay the reference's greedy scan over the candidate
    # positions only.
    fset, rset = set(f_starts.tolist()), set(r_starts.tolist())
    cand = sorted(set(np.flatnonzero(member).tolist()))
    f_sel, r_sel = [], []
    i = 0
    n = len(steps)
    ci = 0
    while i < n:
        while ci < len(cand) and cand[ci] < i:
            ci += 1
        if ci >= len(cand):
            break
        i = cand[ci]
        if i in fset:
            f_sel.append(i)
            i += k
        elif i in rset:
            r_sel.append(i)
            i += k
        else:
            return None
    return (
        np.asarray(f_sel, dtype=np.int64),
        np.asarray(r_sel, dtype=np.int64),
    )


def merge_component(graph, handles: List[int]) -> bool:
    """Merge a chain into one node (src/graph_ops.rs:291-498).  Returns
    False (graph untouched) if any path uses a chain handle outside a
    complete forward or reverse run."""
    if len(handles) < 2:
        return False

    chain = np.asarray(handles, dtype=np.int64)
    rev_chain = (chain ^ 1)[::-1].copy()

    # Validate every path first (:330-377).
    fwd_runs, rev_runs = [], []
    for path in graph.paths:
        plan = _plan_path_rewrite(path.steps, chain, rev_chain)
        if plan is None:
            return False
        fwd_runs.append(plan[0])
        rev_runs.append(plan[1])

    # Concatenate oriented sequences (:302-311).
    parts = []
    for h in handles:
        seq = graph.get_sequence(int(h))
        if seq is not None:
            parts.append(seq)
    new_seq = b"".join(parts)

    new_id = len(graph.nodes)  # next_node_id (:500-502)
    new_fwd = H.forward(new_id)
    new_rev = H.reverse(new_id)
    graph.add_node(new_id, new_seq)

    # Rewrite paths (:383-427): replace each complete run by one handle.
    k = len(chain)
    for path, f_starts, r_starts in zip(graph.paths, fwd_runs, rev_runs):
        if len(f_starts) == 0 and len(r_starts) == 0:
            continue
        steps = path.steps
        repl = np.full(len(steps), -1, dtype=np.int64)
        drop = np.zeros(len(steps), dtype=bool)
        for s in f_starts.tolist():
            repl[s] = new_fwd
            drop[s + 1 : s + k] = True
        for s in r_starts.tolist():
            repl[s] = new_rev
            drop[s + 1 : s + k] = True
        out = np.where(repl >= 0, repl, steps)
        path.steps = out[~drop]

    # Reroute boundary edges (:429-487).
    first, last = handles[0], handles[-1]
    merged_ids = {H.node_id(h) for h in handles}
    new_edges = set()
    for f, t in graph.edges:
        f_in = H.node_id(f) in merged_ids
        t_in = H.node_id(t) in merged_ids
        if f_in and t_in:
            continue  # internal edge
        if not f_in and not t_in:
            new_edges.add((f, t))
        elif f_in:
            if f == last:
                new_edges.add((new_fwd, t))
            if f == H.flip(first):
                new_edges.add((new_rev, t))
        else:
            if t == first:
                new_edges.add((f, new_fwd))
            if t == H.flip(last):
                new_edges.add((f, new_rev))
    graph.edges = new_edges

    # Delete old nodes (:489-495).
    for h in handles:
        nid = H.node_id(h)
        if nid < len(graph.nodes):
            graph.nodes[nid] = None
            graph.ranks.pop(nid, None)
    return True


def compact(graph) -> None:
    """Loop find+merge to fixpoint (src/graph_ops.rs:104-125)."""
    while True:
        compacted = False
        for component in find_simple_components(graph):
            if len(component) >= 2 and merge_component(graph, component):
                compacted = True
        if not compacted:
            break
