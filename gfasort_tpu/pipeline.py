"""Pipeline orchestration: the Ygs / sYgs / Ygsu / L pipelines.

Mirrors the reference's step wrappers and CLI dispatch loop
(gfasort ``src/ygs.rs:97-218``, ``src/bin/gfasort.rs:235-277``):
pipeline characters execute left-to-right, parameters are derived from
the *input* graph once (``src/bin/gfasort.rs:222-229``).

Engine dispatch (``engine=``):

* ``"exact"``  — the sequential oracle (C++ if built, else Python):
  reference-contract output, used for parity.
* ``"batched"`` — the TPU batched engine.
* ``"sweep"`` — the gather-free offset-sweep TPU engine (throughput).
* ``"sharded"`` / ``"sweep-sharded"`` — the multi-device engines over
  the default mesh (all local devices; spans processes after
  ``parallel.init_distributed`` — docs/MULTIHOST.md).
* ``"auto"`` (default) — oracle for small graphs where its runtime is
  negligible and bit-level reference parity is wanted; sweep engines
  for large 1D sorts and large layouts (oracle-grade end-to-end
  pipeline quality).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

from .graph import BidirectedGraph
from .index import PathIndex
from .io.layout_tsv import Layout
from .params import LayoutSGDParams, PathSGDParams, YgsParams
from .algos import (
    apply_grooming_with_reorder,
    compact,
    exact_odgi_topological_order,
    groom,
    priority_topological_order,
)

__all__ = [
    "PIPELINE_CHARS",
    "validate_pipeline",
    "sgd_sort_only",
    "groom_only",
    "topological_sort_only",
    "priority_topological_sort_only",
    "unchop_only",
    "layout_step",
    "ygs_sort",
    "run_pipeline",
    "PipelineResult",
]

PIPELINE_CHARS = "YgsSuL"

# Below this node count the sequential oracle is both fast enough and
# bit-faithful to the reference contract; above it the batched TPU
# engine wins on throughput.
AUTO_ORACLE_MAX_NODES = 200_000


def validate_pipeline(pipeline: str) -> None:
    """src/bin/gfasort.rs:169-180."""
    if not pipeline:
        raise ValueError("Pipeline cannot be empty")
    for c in pipeline:
        if c not in PIPELINE_CHARS:
            raise ValueError(
                f"Unknown pipeline character '{c}'. Valid: Y (SGD), g (groom), "
                f"s (topo-sort), S (priority-topo-sort), u (unchop), L (layout)"
            )


def _sgd_order(graph: BidirectedGraph, params: PathSGDParams, engine: str,
               threads: int = 1):
    if engine == "auto":
        pidx = PathIndex.from_graph(graph)
        engine = "exact" if pidx.num_nodes <= AUTO_ORACLE_MAX_NODES else "sweep"
    if engine == "exact":
        if threads > 1:
            # deterministic N-stream emulation of the reference's -t N
            # (rs:429-432); Python-only (the native oracle is -t 1)
            from .ops.exact import path_sgd_sort_exact

            return path_sgd_sort_exact(graph, params, nthreads=threads)
        try:
            from . import native

            if native.available():
                return native.path_sgd_sort_native(graph, params)
        except Exception:
            pass
        from .ops.exact import path_sgd_sort_exact

        return path_sgd_sort_exact(graph, params)
    if engine == "batched":
        from .ops.sgd import path_sgd_sort_batched

        return path_sgd_sort_batched(graph, params)
    if engine == "sweep":
        from .ops.sweep import path_sgd_sort_sweep

        return path_sgd_sort_sweep(graph, params)
    if engine == "sharded":
        from .parallel import path_sgd_sort_sharded

        return path_sgd_sort_sharded(graph, params)
    if engine == "sweep-sharded":
        from .parallel import path_sgd_sort_sweep_sharded

        return path_sgd_sort_sweep_sharded(graph, params)
    raise ValueError(f"unknown engine {engine!r}")


def sgd_sort_only(
    graph: BidirectedGraph, params: PathSGDParams, engine: str = "auto",
    threads: int = 1,
) -> None:
    """'Y' step (src/ygs.rs:195-206): SGD order then renumber."""
    graph.apply_ordering(_sgd_order(graph, params, engine, threads))


def groom_only(graph: BidirectedGraph) -> None:
    """'g' step (src/ygs.rs:180-192): BFS groom, apply with renumber."""
    apply_grooming_with_reorder(graph, groom(graph, use_bfs=True), reorder=True)


def topological_sort_only(graph: BidirectedGraph) -> None:
    """'s' step (src/ygs.rs:147-158): heads-only exact ODGI topo sort."""
    graph.apply_ordering(
        exact_odgi_topological_order(graph, use_heads=True, use_tails=False)
    )


def priority_topological_sort_only(graph: BidirectedGraph) -> None:
    """'S' step (src/ygs.rs:163-177): priority = current node_order."""
    order = priority_topological_order(
        graph, list(graph.node_order), use_heads=True, reverse_edges=False
    )
    graph.apply_ordering(order)


def unchop_only(graph: BidirectedGraph) -> None:
    """'u' step (src/ygs.rs:210-218): compact + sequential renumber."""
    compact(graph)
    graph.renumber_nodes_sequentially()


def layout_step(
    graph: BidirectedGraph,
    params: LayoutSGDParams,
    engine: str = "auto",
    stress_samples: int = 10_000,
) -> Tuple[Layout, float]:
    """'L' step (src/bin/gfasort.rs:265-274): nD layout + sampled stress."""
    pidx = PathIndex.from_graph(graph)
    eng = engine
    if eng == "auto":
        eng = "exact" if pidx.num_nodes <= AUTO_ORACLE_MAX_NODES else "sweep"
    if eng == "exact":
        layout = None
        try:
            from . import native

            if native.available():
                layout = native.path_linear_sgd_layout_native(graph, params, pidx)
        except Exception:
            layout = None
        if layout is None:
            from .ops.exact import path_linear_sgd_layout_exact

            layout = path_linear_sgd_layout_exact(graph, params, pidx)
    elif eng in ("sweep", "auto"):
        from .ops.sweep_nd import path_linear_sgd_layout_sweep

        layout = path_linear_sgd_layout_sweep(graph, params, pidx)
    elif eng in ("sharded", "sweep-sharded"):
        from .parallel import path_linear_sgd_layout_sweep_sharded

        layout = path_linear_sgd_layout_sweep_sharded(graph, params, pidx=pidx)
    else:
        from .ops.sgd import path_linear_sgd_layout_batched

        layout = path_linear_sgd_layout_batched(graph, params, pidx)
    from .ops.exact import calculate_layout_stress

    stress = calculate_layout_stress(graph, layout, stress_samples)
    return layout, stress


def ygs_sort(graph: BidirectedGraph, params: YgsParams, engine: str = "auto") -> None:
    """The Ygs pipeline (src/ygs.rs:97-143): SGD → groom(BFS) → topo."""
    sgd_sort_only(graph, params.path_sgd, engine)
    groom_only(graph)
    topological_sort_only(graph)


@dataclass
class PipelineResult:
    graph: BidirectedGraph
    layout: Optional[Layout] = None
    layout_stress: Optional[float] = None
    tracer: object = None


def run_pipeline(
    graph: BidirectedGraph,
    pipeline: str = "sYgs",
    iter_max: int = 100,
    dimensions: int = 2,
    layout_iter: int = 30,
    engine: str = "auto",
    seed: Optional[int] = None,
    batch: Optional[int] = None,
    verbose: int = 0,
    log=print,
    tracer=None,
    threads: int = 1,
) -> PipelineResult:
    """Execute a pipeline string left-to-right on ``graph`` (mutating
    it), mirroring src/bin/gfasort.rs:182-277.  Parameters are derived
    from the graph ONCE, before any step runs, like the reference."""
    validate_pipeline(pipeline)

    ygs_params = YgsParams.from_graph(graph, verbose=verbose)
    sgd_params = replace(ygs_params.path_sgd, iter_max=iter_max)
    pidx = PathIndex.from_graph(graph)
    layout_params = LayoutSGDParams().derive_from_graph(pidx, dimensions)
    layout_params = replace(layout_params, iter_max=layout_iter)
    if seed is not None:
        sgd_params = replace(sgd_params, seed=seed)
        layout_params = replace(layout_params, seed=seed)
    if batch is not None:
        sgd_params = replace(sgd_params, batch=batch)
        layout_params = replace(layout_params, batch=batch)

    result = PipelineResult(graph=graph)
    names = {
        "Y": "SGD", "g": "groom", "s": "topo-sort",
        "S": "priority-topo-sort", "u": "unchop",
        "L": f"{dimensions}D layout",
    }
    if tracer is None:
        from .trace import Tracer

        tracer = Tracer()
    result.tracer = tracer
    import time as _time

    for step_num, c in enumerate(pipeline):
        if verbose >= 1:
            log(f"[gfasort] [{step_num + 1}/{len(pipeline)}] {names[c]}")
        _t0 = _time.perf_counter()
        with tracer.step(
            names[c], step=step_num + 1,
            nodes=graph.node_count(), edges=len(graph.edges),
        ):
            if c == "Y":
                sgd_sort_only(graph, sgd_params, engine, threads)
            elif c == "g":
                groom_only(graph)
            elif c == "s":
                topological_sort_only(graph)
            elif c == "S":
                priority_topological_sort_only(graph)
            elif c == "u":
                unchop_only(graph)
            elif c == "L":
                layout, stress = layout_step(graph, layout_params, engine)
                result.layout = layout
                result.layout_stress = stress
                if verbose >= 1:
                    log(f"[gfasort] layout stress: {stress:.6f}")
        if verbose >= 1:
            log(
                f"[gfasort]   {names[c]} took "
                f"{_time.perf_counter() - _t0:.2f}s"
            )
    if verbose >= 2:
        log(f"[gfasort] step timings: {tracer.summary()}")
    return result
