"""Pipeline, CLI, batched-engine, and tool tests.  Mirrors the
reference's integration tests (tests/integration_tests.rs): structure
preservation, determinism, per-step runs, write/reload round-trip."""

import subprocess
import sys
from dataclasses import replace

import numpy as np
import pytest

from gfasort_tpu import BidirectedGraph, PathIndex, YgsParams, LayoutSGDParams
from gfasort_tpu import handle as H
from gfasort_tpu.io import gfa
from gfasort_tpu.pipeline import (
    PipelineResult,
    run_pipeline,
    sgd_sort_only,
    groom_only,
    topological_sort_only,
    unchop_only,
    validate_pipeline,
    ygs_sort,
)


def test_validate_pipeline():
    validate_pipeline("sYgs")
    validate_pipeline("YgSuL")
    with pytest.raises(ValueError):
        validate_pipeline("")
    with pytest.raises(ValueError):
        validate_pipeline("Yx")


def test_ygs_preserves_structure(simple_gfa):
    g = gfa.parse_gfa_numeric(simple_gfa)
    n, e = g.node_count(), len(g.edges)
    hashes = g.compute_all_path_hashes()
    ygs_sort(g, YgsParams.from_graph(g))
    assert g.node_count() == n
    assert len(g.edges) == e
    assert g.validate_path_hashes(hashes)
    assert not g.validate_graph_consistency()
    # renumbered 1..N
    assert g.live_node_ids() == list(range(1, n + 1))


def test_ygs_determinism(simple_gfa):
    g1 = gfa.parse_gfa_numeric(simple_gfa)
    g2 = gfa.parse_gfa_numeric(simple_gfa)
    params = YgsParams.from_graph(g1)
    ygs_sort(g1, params)
    ygs_sort(g2, params)
    assert g1.nodes == g2.nodes
    assert g1.edges == g2.edges
    for p1, p2 in zip(g1.paths, g2.paths):
        assert np.array_equal(p1.steps, p2.steps)


def test_individual_steps(simple_gfa):
    base = gfa.parse_gfa_numeric(simple_gfa)
    params = YgsParams.from_graph(base)
    for step in (
        lambda g: sgd_sort_only(g, params.path_sgd),
        groom_only,
        topological_sort_only,
        unchop_only,
    ):
        g = base.clone()
        hashes = g.compute_all_path_hashes()
        step(g)
        assert g.node_count() > 0
        assert g.validate_path_hashes(hashes)


def test_full_pipeline_chars(lil_gfa, tmp_path):
    g = gfa.parse_gfa_numeric(lil_gfa)
    hashes = g.compute_all_path_hashes()
    res = run_pipeline(g, pipeline="sYgSuL", iter_max=10, layout_iter=3,
                       verbose=0)
    assert isinstance(res, PipelineResult)
    assert res.layout is not None
    assert res.layout_stress is not None and res.layout_stress >= 0
    assert g.validate_path_hashes(hashes)


def test_pipeline_derives_params_once(simple_gfa):
    # parameters must come from the INPUT graph, before any step
    g = gfa.parse_gfa_numeric(simple_gfa)
    res = run_pipeline(g, pipeline="us", verbose=0)
    assert res.graph.node_count() > 0


def test_drb1_ygs_reduced(drb1_gfa):
    g = gfa.parse_gfa_numeric(drb1_gfa)
    n = g.node_count()
    hashes = g.compute_all_path_hashes()
    run_pipeline(g, pipeline="Ygs", iter_max=10, verbose=0)
    assert g.node_count() == n
    assert g.validate_path_hashes(hashes)


def test_write_and_reload(simple_gfa, tmp_path):
    g = gfa.parse_gfa_numeric(simple_gfa)
    ygs_sort(g, YgsParams.from_graph(g))
    out = tmp_path / "sorted.gfa"
    out.write_text(gfa.write_gfa(g))
    reloaded = gfa.parse_gfa_numeric(out.read_text())
    assert reloaded.node_count() == g.node_count()
    assert reloaded.edges == g.edges


# ------------------------------------------------------- batched engine
def test_batched_engine_matches_oracle_on_simple(simple_gfa):
    """Batched vs oracle on simple.gfa: same node set, near-identical
    ranks (collision-averaged rounds may swap adjacent bubble variants;
    exact parity is the oracle's job — hybrid dispatch)."""
    from gfasort_tpu.ops.exact import path_sgd_sort_exact
    from gfasort_tpu.ops.sgd import path_sgd_sort_batched

    g = gfa.parse_gfa_numeric(simple_gfa)
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float64",
                pow_mode="fpp")
    ob = [h >> 1 for h in path_sgd_sort_batched(g, p)]
    oe = [h >> 1 for h in path_sgd_sort_exact(g, p)]
    assert sorted(ob) == sorted(oe)
    re = {n: i for i, n in enumerate(oe)}
    # every node within 2 ranks of the oracle position
    assert all(abs(i - re[n]) <= 2 for i, n in enumerate(ob))


def test_batched_engine_quality_lil(lil_gfa):
    """Batched order must be rank-correlated with the oracle order
    (adjacent bubble swaps allowed — SURVEY.md §9 hard parts)."""
    from gfasort_tpu.ops.exact import path_sgd_sort_exact
    from gfasort_tpu.ops.sgd import path_sgd_sort_batched

    g = gfa.parse_gfa_numeric(lil_gfa)
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float64",
                pow_mode="fpp")
    ob = [h >> 1 for h in path_sgd_sort_batched(g, p)]
    oe = [h >> 1 for h in path_sgd_sort_exact(g, p)]
    rb = {n: i for i, n in enumerate(ob)}
    re = {n: i for i, n in enumerate(oe)}
    ranks_b = [rb[n] for n in sorted(rb)]
    ranks_e = [re[n] for n in sorted(re)]
    rho = np.corrcoef(ranks_b, ranks_e)[0, 1]
    assert rho > 0.95, f"rank correlation {rho}"


def test_batched_layout_runs(lil_gfa):
    from gfasort_tpu.ops.exact import calculate_layout_stress
    from gfasort_tpu.ops.sgd import path_linear_sgd_layout_batched

    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    lp = replace(LayoutSGDParams().derive_from_graph(pidx, 2),
                 dtype="float64", pow_mode="fpp")
    lay = path_linear_sgd_layout_batched(g, lp, pidx)
    assert lay.num_nodes == 15
    stress = calculate_layout_stress(g, lay, 2000)
    assert 0 < stress < 1.0


def test_batched_engine_fast_mode(simple_gfa):
    """pow_mode='fast' (f32-friendly, no x64) converges too."""
    from gfasort_tpu.ops.sgd import path_sgd_sort_batched

    g = gfa.parse_gfa_numeric(simple_gfa)
    p = replace(YgsParams.from_graph(g).path_sgd, dtype="float32",
                pow_mode="fast")
    order = path_sgd_sort_batched(g, p)
    assert sorted(h >> 1 for h in order) == list(range(1, 16))


# ------------------------------------------------------------ CLI
def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "gfasort_tpu.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )


def test_cli_sygs(data_dir, tmp_path):
    out = tmp_path / "out.gfa"
    r = run_cli("-i", str(data_dir / "simple.gfa"), "-o", str(out),
                "-p", "sYgs", "-v", "1")
    assert r.returncode == 0, r.stderr
    assert "[gfasort] done" in r.stderr
    g = gfa.parse_gfa_numeric(out.read_text())
    assert g.node_count() == 15


def test_cli_layout(data_dir, tmp_path):
    out = tmp_path / "out.gfa"
    tsv = tmp_path / "layout.tsv"
    r = run_cli("-i", str(data_dir / "lil.gfa"), "-o", str(out),
                "-p", "L", "--layout-out", str(tsv), "--layout-iter", "3")
    assert r.returncode == 0, r.stderr
    assert "layout stress" in r.stderr
    from gfasort_tpu import Layout

    lay = Layout.read_tsv_file(tsv)
    assert lay.num_nodes == 15 and lay.dimensions == 2


def test_cli_bad_pipeline(data_dir, tmp_path):
    r = run_cli("-i", str(data_dir / "simple.gfa"),
                "-o", str(tmp_path / "x.gfa"), "-p", "Yz")
    assert r.returncode == 1
    assert "Unknown pipeline character" in r.stderr


def test_cli_missing_input(tmp_path):
    r = run_cli("-i", str(tmp_path / "nope.gfa"), "-o", str(tmp_path / "x.gfa"))
    assert r.returncode == 1
    assert "Error reading file" in r.stderr


# ------------------------------------------------------------ tools
def test_sgd_diagnostics_tool(lil_gfa, capsys):
    from gfasort_tpu.tools.sgd_diagnostics import diagnose

    g = gfa.parse_gfa_numeric(lil_gfa)
    lines = []
    diagnose(g, log=lines.append)
    text = "\n".join(lines)
    assert "Path orientation analysis" in text
    assert "Analysis complete" in text


def test_measure_layout_quality_tool(simple_gfa):
    from gfasort_tpu.tools.measure_layout_quality import measure

    g = gfa.parse_gfa_numeric(simple_gfa)
    rep = measure(g)
    assert rep.total_steps > 0
    assert rep.rmse >= 0


def test_compare_layouts_tool(lil_gfa, tmp_path):
    from gfasort_tpu.tools.compare_layouts import (
        calculate_stress,
        load_gfasort_layout,
        load_odgi_layout,
    )
    from gfasort_tpu.ops.exact import path_linear_sgd_layout_exact

    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    lp = replace(LayoutSGDParams().derive_from_graph(pidx, 2), iter_max=3,
                 min_term_updates=100)
    lay = path_linear_sgd_layout_exact(g, lp, pidx)
    ours = tmp_path / "ours.tsv"
    lay.write_tsv_file(ours)
    loaded = load_gfasort_layout(str(ours))
    assert len(loaded) == 15
    s = calculate_stress(g, loaded, 5000)
    assert s > 0
    # synthesize an ODGI-format file (2 rows per node)
    odgi = tmp_path / "odgi.tsv"
    with open(odgi, "w") as fh:
        fh.write("idx\tX\tY\tcomponent\n")
        for node in range(lay.num_nodes):
            for end in range(2):
                fh.write(f"{node * 2 + end}\t{lay.get(node, end, 0)}"
                         f"\t{lay.get(node, end, 1)}\t0\n")
    od = load_odgi_layout(str(odgi))
    assert len(od) == 15
    assert calculate_stress(g, od, 5000) == pytest.approx(s)


def test_stress_native_matches_python(lil_gfa):
    """The C++ layout_stress_2d must reproduce the Python loop's RNG
    stream and arithmetic bit-for-bit."""
    pytest.importorskip("gfasort_tpu.native")
    from gfasort_tpu.native import available, layout_stress_2d_native
    from gfasort_tpu.tools.compare_layouts import calculate_stress_py

    if not available():
        pytest.skip("native lib unavailable")
    import numpy as np

    from gfasort_tpu import PathIndex
    from gfasort_tpu.io import gfa as gfa_io

    g = gfa_io.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    rng = np.random.default_rng(5)
    n = pidx.num_nodes
    xs = rng.normal(size=n) * 50
    ys = rng.normal(size=n) * 50
    present = np.ones(n, np.uint8)
    present[::5] = 0  # some nodes missing from the layout
    layout = {i: (xs[i], ys[i]) for i in range(n) if present[i]}
    s_py = calculate_stress_py(pidx, layout, 4000)
    s_cc = layout_stress_2d_native(pidx, xs, ys, present, 4000)
    assert s_cc == s_py


def test_pipeline_sweep_sharded_engine(lil_gfa):
    """engine='sweep-sharded' routes Y to the multi-device sweep and L
    to the sharded layout over the default (8-virtual-device) mesh."""
    from gfasort_tpu.io import gfa
    from gfasort_tpu.pipeline import run_pipeline

    g = gfa.parse_gfa_numeric(lil_gfa)
    h0 = g.compute_all_path_hashes()
    result = run_pipeline(
        g, "YL", iter_max=5, layout_iter=3, dimensions=2,
        engine="sweep-sharded",
    )
    assert g.compute_all_path_hashes() == h0
    assert result.layout is not None
    import numpy as np

    assert np.isfinite(result.layout.coords).all()
