"""CI-sized regression of the chromosome-scale end-to-end path
(VERDICT r1 task 7): the full ``sYgsuL`` pipeline with the sweep
engine FORCED, on a reduced synthetic pangenome, end-to-end through
the same code path scripts/e2e_chromosome.py exercises at 1M nodes."""

import numpy as np

from gfasort_tpu.io.gfa import parse_gfa_numeric
from gfasort_tpu.pipeline import run_pipeline
from gfasort_tpu.tools.make_synthetic_gfa import synthetic_gfa_lines


def test_synthetic_gfa_is_valid():
    from gfasort_tpu.verify import comprehensive_verify

    text = "\n".join(synthetic_gfa_lines(500, 3, 400, seed=1)) + "\n"
    g = parse_gfa_numeric(text)
    assert g.node_count() == 500
    assert len(g.paths) == 3
    rep = comprehensive_verify(g)
    assert rep.ok, rep.all_errors()[:3]


def test_e2e_sweep_sYgsuL_reduced_scale():
    text = "\n".join(synthetic_gfa_lines(20_000, 4, 15_000, seed=2)) + "\n"
    g = parse_gfa_numeric(text)
    h0 = g.compute_all_path_hashes()
    n0 = g.node_count()

    result = run_pipeline(
        g, "sYgsuL", iter_max=5, layout_iter=3, dimensions=2,
        engine="sweep",
    )
    assert g.compute_all_path_hashes() == h0
    assert g.node_count() <= n0  # unchop may merge
    assert result.layout is not None
    assert result.layout.dimensions == 2
    assert np.isfinite(result.layout.coords).all()
    # the sort must actually order the graph: ids are 1..N after
    # renumbering and every path's steps reference live nodes
    assert sorted(
        nid for nid, s in enumerate(g.nodes) if s is not None
    ) == list(range(1, g.node_count() + 1))
