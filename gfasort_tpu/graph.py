"""Host-side bidirected graph kernel.

Struct-of-arrays rebuild of the reference's ``BidirectedGraph``
(gfasort ``src/graph_ops.rs:7-16``): nodes are a dense id-indexed list of
optional sequences (stable iteration order), edges a set of (from, to)
handle pairs with the bidirected "store one of edge/complement" invariant
(``src/graph_ops.rs:626-638``), paths carry numpy ``int64`` handle arrays
so the path index and all step remappings are vectorized, and
``node_order`` records GFA insertion order, which seeds the SGD initial
positions (``src/graph_ops.rs:14-16``, ``src/sgd.rs:275-294``).

This layer is deliberately host/NumPy: graph mutation (renumbering,
grooming, unchop) is a worklist problem that does not belong on the MXU.
The TPU-resident view of the graph is built from it by
:mod:`gfasort_tpu.index`.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from . import handle as H

__all__ = ["BiPath", "BidirectedGraph"]


class BiPath:
    """A path through the graph: a name plus an int64 array of handles.

    Mirrors the reference ``BiPath`` (src/graph.rs:131-172) with an
    array-of-handles representation.
    """

    __slots__ = ("name", "steps")

    def __init__(self, name: str, steps: Optional[Sequence[int]] = None):
        self.name = name
        self.steps = np.asarray(
            steps if steps is not None else [], dtype=np.int64
        )

    def add_step(self, handle: int) -> None:
        self.steps = np.append(self.steps, np.int64(handle))

    def __len__(self) -> int:
        return int(self.steps.shape[0])

    def __repr__(self) -> str:
        return f"BiPath({self.name!r}, {len(self)} steps)"


class BidirectedGraph:
    """Bidirected sequence graph with the reference's exact semantics."""

    def __init__(self) -> None:
        # Index = node id; None = deleted / never present.
        self.nodes: List[Optional[bytes]] = []
        # Optional per-node rank assigned by apply_ordering (0-based).
        self.ranks: Dict[int, int] = {}
        # Stored edge forms; the complement of a stored edge is implied
        # and never stored (src/graph_ops.rs:626-638).
        self.edges: set[Tuple[int, int]] = set()
        self.paths: List[BiPath] = []
        # GFA insertion order of node ids.  NEVER rewritten on renumber;
        # the reference keeps it stale on purpose and SGD seeding
        # iterates it as-is (src/sgd.rs:276-284).
        self.node_order: List[int] = []

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    def add_node(self, nid: int, sequence: bytes) -> None:
        """Insert/overwrite a node (src/graph_ops.rs:613-623)."""
        if nid >= len(self.nodes):
            self.nodes.extend([None] * (nid + 1 - len(self.nodes)))
        if self.nodes[nid] is None:
            self.node_order.append(nid)
        self.nodes[nid] = bytes(sequence)

    def add_edge(self, from_h: int, to_h: int) -> None:
        """Insert the edge unless it or its complement exists
        (src/graph_ops.rs:626-638)."""
        edge = (from_h, to_h)
        complement = (H.flip(to_h), H.flip(from_h))
        if edge not in self.edges and complement not in self.edges:
            self.edges.add(edge)

    def build_path(self, name: str, steps: Iterable[Tuple[int, bool]]) -> None:
        """Append a path from (node_id, is_reverse) pairs
        (src/graph_ops.rs:684-690)."""
        self.paths.append(
            BiPath(name, [H.encode(nid, int(rev)) for nid, rev in steps])
        )

    # ------------------------------------------------------------------
    # Queries
    # ------------------------------------------------------------------
    def node_count(self) -> int:
        return sum(1 for n in self.nodes if n is not None)

    def node_len_array(self) -> np.ndarray:
        """Per-id sequence lengths as int64, ``-1`` for dead/absent slots.
        One native pass at scale; the Python loop is the fallback."""
        out = np.empty(len(self.nodes), dtype=np.int64)
        if len(self.nodes) >= 4096:
            from .native.build import load_py

            pylib = load_py()
            if pylib is not None:
                import ctypes

                n = pylib.node_len_fill(
                    self.nodes,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
                if n >= 0:
                    return out
        for i, seq in enumerate(self.nodes):
            out[i] = -1 if seq is None else len(seq)
        return out

    def live_node_ids(self) -> List[int]:
        if len(self.nodes) >= 4096:
            return np.flatnonzero(self.node_len_array() >= 0).tolist()
        return [i for i, n in enumerate(self.nodes) if n is not None]

    def edges_to_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        """The stored edge forms as two int64 arrays (from, to)."""
        n = len(self.edges)
        ef = np.empty(n, dtype=np.int64)
        et = np.empty(n, dtype=np.int64)
        if n >= 4096:
            from .native.build import load_py

            pylib = load_py()
            if pylib is not None:
                import ctypes

                p = ctypes.POINTER(ctypes.c_int64)
                if pylib.edge_set_to_arrays(
                    self.edges, ef.ctypes.data_as(p), et.ctypes.data_as(p)
                ) == n:
                    return ef, et
        for i, (f, t) in enumerate(self.edges):
            ef[i] = f
            et[i] = t
        return ef, et

    def total_sequence_length(self) -> int:
        return sum(len(n) for n in self.nodes if n is not None)

    def get_sequence(self, handle: int) -> Optional[bytes]:
        """Oriented sequence of a handle (src/graph_ops.rs:641-646)."""
        nid = H.node_id(handle)
        if nid >= len(self.nodes) or self.nodes[nid] is None:
            return None
        seq = self.nodes[nid]
        return H.reverse_complement(seq) if H.is_reverse(handle) else seq

    def has_edge(self, from_h: int, to_h: int) -> bool:
        """Edge existence, checking both forms (src/graph_ops.rs:649-653)."""
        return (from_h, to_h) in self.edges or (
            H.flip(to_h),
            H.flip(from_h),
        ) in self.edges

    def edges_from(self, handle: int) -> List[int]:
        """All successors of ``handle``, matching direct and complement
        stored forms (src/graph_ops.rs:656-667)."""
        out = []
        for f, t in self.edges:
            if f == handle:
                out.append(t)
            elif H.flip(t) == handle:
                out.append(H.flip(f))
        return out

    def edges_to(self, handle: int) -> List[int]:
        """All predecessors of ``handle`` (src/graph_ops.rs:670-681)."""
        out = []
        for f, t in self.edges:
            if t == handle:
                out.append(f)
            elif H.flip(f) == handle:
                out.append(H.flip(t))
        return out

    def paths_through_node(self, nid: int) -> List[int]:
        """Indices of paths visiting ``nid`` (src/graph_ops.rs:513-524)."""
        out = []
        for i, path in enumerate(self.paths):
            if np.any((path.steps >> 1) == nid):
                out.append(i)
        return out

    def path_sequence(self, path: BiPath) -> bytes:
        """Concatenated oriented sequence of a path (src/graph.rs:161-172)."""
        parts = []
        for h in path.steps.tolist():
            seq = self.get_sequence(int(h))
            if seq is not None:
                parts.append(seq)
        return b"".join(parts)

    # ------------------------------------------------------------------
    # Renumbering / ordering
    # ------------------------------------------------------------------
    def _remap_arrays(self, mapping: Dict[int, int], keep_unmapped: bool) -> None:
        """Rewrite edges and path steps through an id mapping.

        ``keep_unmapped=True`` reproduces apply_node_id_mapping semantics
        (unmapped ids pass through, src/graph_ops.rs:52-83);
        ``keep_unmapped=False`` reproduces apply_ordering semantics
        (edges touching unmapped ids are dropped; unmapped path steps
        keep their old id, src/graph_ops.rs:1983-2020).
        """
        native_done = False
        if len(self.edges) >= 4096 and mapping:
            # C fast path: rewrite the whole set through an id LUT in one
            # pass (the per-edge Python loop costs ~5 µs/edge at scale).
            from .native.build import load_py

            pylib = load_py()
            if pylib is not None:
                lut = np.full(max(mapping) + 1, -1, dtype=np.int64)
                keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
                vals = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
                lut[keys] = vals
                import ctypes

                self.edges = pylib.remap_edge_set(
                    self.edges,
                    lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    len(lut),
                    0 if keep_unmapped else 1,
                )
                native_done = True
        if not native_done:
            new_edges: set[Tuple[int, int]] = set()
            for f, t in self.edges:
                fid, tid = H.node_id(f), H.node_id(t)
                if keep_unmapped:
                    nf = mapping.get(fid, fid)
                    nt = mapping.get(tid, tid)
                else:
                    if fid not in mapping or tid not in mapping:
                        continue
                    nf, nt = mapping[fid], mapping[tid]
                new_edges.add(
                    (H.encode(nf, H.is_reverse(f)), H.encode(nt, H.is_reverse(t)))
                )
            self.edges = new_edges

        if mapping:
            max_old = max(
                (max(mapping), *(int(p.steps.max() >> 1) for p in self.paths if len(p))),
                default=0,
            )
            lut = np.arange(max_old + 1, dtype=np.int64)
            keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
            vals = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
            lut[keys] = vals
            for path in self.paths:
                if len(path):
                    ids = path.steps >> 1
                    path.steps = (lut[ids] << 1) | (path.steps & 1)

    def apply_node_id_mapping(self, mapping: Dict[int, int]) -> None:
        """Renumber nodes through ``mapping`` (src/graph_ops.rs:36-84).
        Ids absent from the mapping keep their old id."""
        max_new = max(mapping.values(), default=0)
        new_nodes: List[Optional[bytes]] = [None] * (max_new + 1)
        new_ranks: Dict[int, int] = {}
        for old_id, seq in enumerate(self.nodes):
            if seq is None:
                continue
            new_id = mapping.get(old_id, old_id)
            if new_id >= len(new_nodes):
                new_nodes.extend([None] * (new_id + 1 - len(new_nodes)))
            new_nodes[new_id] = seq
            if old_id in self.ranks:
                new_ranks[new_id] = self.ranks[old_id]
        self.nodes = new_nodes
        self.ranks = new_ranks
        self._remap_arrays(mapping, keep_unmapped=True)

    def renumber_nodes_sequentially(self) -> None:
        """Compact live ids to 1..N in id order (src/graph_ops.rs:88-102)."""
        mapping = {old: i + 1 for i, old in enumerate(self.live_node_ids())}
        self.apply_node_id_mapping(mapping)

    def apply_ordering(self, ordering: Sequence[int]) -> None:
        """Renumber so ordering[k] becomes id k+1 (src/graph_ops.rs:1939-2025).

        ``ordering`` is a sequence of handles; orientation bits are
        ignored for the renumbering (the reference maps node ids only).
        Nodes absent from the ordering are dropped.
        """
        if len(ordering) == 0:
            return
        old_to_new = {H.node_id(int(h)): k + 1 for k, h in enumerate(ordering)}
        max_new = max(old_to_new.values())
        new_nodes: List[Optional[bytes]] = [None] * (max_new + 1)
        new_ranks: Dict[int, int] = {}
        for old_id, new_id in old_to_new.items():
            if old_id < len(self.nodes) and self.nodes[old_id] is not None:
                new_nodes[new_id] = self.nodes[old_id]
                new_ranks[new_id] = new_id - 1  # 0-based rank (rs:1976)
        self.nodes = new_nodes
        self.ranks = new_ranks
        self._remap_arrays(old_to_new, keep_unmapped=False)

    # ------------------------------------------------------------------
    # Validation & hashing (src/graph_ops.rs:741-893)
    # ------------------------------------------------------------------
    def validate_graph_consistency(self) -> List[str]:
        """Edges/paths must reference live nodes (src/graph_ops.rs:741-778).
        Returns a list of error strings (empty = consistent)."""
        errors = []
        n = len(self.nodes)

        def live(nid: int) -> bool:
            return nid < n and self.nodes[nid] is not None

        for f, t in self.edges:
            if not live(H.node_id(f)):
                errors.append(f"Edge references non-existent node: {H.node_id(f)} (from)")
            if not live(H.node_id(t)):
                errors.append(f"Edge references non-existent node: {H.node_id(t)} (to)")
        for path in self.paths:
            for nid in np.unique(path.steps >> 1).tolist():
                if not live(int(nid)):
                    errors.append(
                        f"Path {path.name} references non-existent node: {nid}"
                    )
        return errors

    def compute_path_hash(self, path: BiPath) -> str:
        """SHA-256 over the oriented step sequences (src/graph_ops.rs:781-791)."""
        hasher = hashlib.sha256()
        for h in path.steps.tolist():
            seq = self.get_sequence(int(h))
            if seq is not None:
                hasher.update(seq)
        return hasher.hexdigest()

    def compute_all_path_hashes(self) -> Dict[str, str]:
        return {p.name: self.compute_path_hash(p) for p in self.paths}

    def validate_path_hashes(self, expected: Dict[str, str]) -> bool:
        """True iff every expected path hash is unchanged
        (src/graph_ops.rs:838-859)."""
        current = self.compute_all_path_hashes()
        return all(current.get(name) == h for name, h in expected.items())

    def verify_path_edges(self) -> int:
        """Add any path-implied edges missing from the edge set; returns the
        number added (src/graph_ops.rs:862-893)."""
        added = 0
        for path in self.paths:
            steps = path.steps.tolist()
            for a, b in zip(steps, steps[1:]):
                if not self.has_edge(int(a), int(b)):
                    self.edges.add((int(a), int(b)))
                    added += 1
        return added

    def validate_paths(self) -> Dict[str, int]:
        """Path statistics (src/graph_ops.rs:805-835): counts of
        consecutive repeated steps and max per-node visit count per
        path.  Repeated nodes are VALID (structural variation); this
        reports, never fails."""
        stats = {"paths_with_repeats": 0, "consecutive_repeats": 0}
        for path in self.paths:
            steps = path.steps
            if len(steps) < 2:
                continue
            consec = int((steps[:-1] == steps[1:]).sum())
            ids, counts = np.unique(steps >> 1, return_counts=True)
            if consec > 0 or (counts > 5).any():
                stats["paths_with_repeats"] += 1
            stats["consecutive_repeats"] += consec
        return stats

    # ------------------------------------------------------------------
    # Misc
    # ------------------------------------------------------------------
    def count_edge_directions(self) -> Tuple[int, int]:
        """(forward, backward) edge counts by node-id order
        (src/graph_ops.rs:1215-1227); self-id edges uncounted."""
        fwd = bwd = 0
        for f, t in self.edges:
            fid, tid = H.node_id(f), H.node_id(t)
            if fid < tid:
                fwd += 1
            elif fid > tid:
                bwd += 1
        return fwd, bwd

    def clone(self) -> "BidirectedGraph":
        g = BidirectedGraph()
        g.nodes = list(self.nodes)
        g.ranks = dict(self.ranks)
        g.edges = set(self.edges)
        g.paths = [BiPath(p.name, p.steps.copy()) for p in self.paths]
        g.node_order = list(self.node_order)
        return g

    def __repr__(self) -> str:
        return (
            f"BidirectedGraph(nodes={self.node_count()}, "
            f"edges={len(self.edges)}, paths={len(self.paths)})"
        )


def alignment_to_edges(
    query_handle: int,
    target_handle: int,
    query_len: int,
    target_len: int,
    is_reverse_alignment: bool,
) -> List[Tuple[int, int]]:
    """Edge(s) implied by an oriented alignment
    (src/graph_ops.rs:2028-2049): for reverse alignments the target
    handle is flipped; one edge from query end to target start."""
    del query_len, target_len  # kept for API parity; unused (as in ref)
    to_h = H.flip(target_handle) if is_reverse_alignment else target_handle
    return [(query_handle, to_h)]
