"""nD layout sweep engine tests."""

from dataclasses import replace

import numpy as np

from gfasort_tpu import LayoutSGDParams, PathIndex
from gfasort_tpu.io import gfa
from gfasort_tpu.ops.exact import calculate_layout_stress
from gfasort_tpu.ops.sweep_nd import path_linear_sgd_layout_sweep


def test_layout_sweep_quality(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    lp = replace(LayoutSGDParams().derive_from_graph(pidx, 2),
                 dtype="float32", pow_mode="fast")
    lay = path_linear_sgd_layout_sweep(g, lp, pidx)
    assert lay.num_nodes == 15 and lay.dimensions == 2
    stress = calculate_layout_stress(g, lay, 3000)
    assert 0 < stress < 0.1  # oracle achieves ~0.004; sweep must be close


def test_layout_sweep_3d(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    lp = replace(LayoutSGDParams().derive_from_graph(pidx, 3),
                 dtype="float32", pow_mode="fast", iter_max=5)
    lay = path_linear_sgd_layout_sweep(g, lp, pidx)
    assert lay.dimensions == 3
    assert np.isfinite(lay.coords).all()


def test_layout_sweep_deterministic(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    lp = replace(LayoutSGDParams().derive_from_graph(pidx, 2),
                 dtype="float32", pow_mode="fast", iter_max=5)
    l1 = path_linear_sgd_layout_sweep(g, lp, pidx)
    l2 = path_linear_sgd_layout_sweep(g, lp, pidx)
    np.testing.assert_array_equal(l1.coords, l2.coords)


def test_layout_sweep_empty():
    from gfasort_tpu import BidirectedGraph

    g = BidirectedGraph()
    lay = path_linear_sgd_layout_sweep(g, LayoutSGDParams())
    assert lay.num_nodes == 0


def test_nd_chunked_dispatch_matches_single(monkeypatch, lil_gfa):
    from dataclasses import replace

    from gfasort_tpu.io import gfa
    from gfasort_tpu.index import PathIndex
    from gfasort_tpu.params import LayoutSGDParams
    from gfasort_tpu.ops.sweep_nd import path_linear_sgd_layout_sweep

    g = gfa.parse_gfa_numeric(lil_gfa)
    pidx = PathIndex.from_graph(g)
    p = replace(
        LayoutSGDParams().derive_from_graph(pidx, 2),
        dtype="float32", pow_mode="fast", iter_max=7,
    )
    l1 = path_linear_sgd_layout_sweep(g, p, pidx, consensus_every=4)
    monkeypatch.setenv("GFASORT_SWEEP_DISPATCH_ELEMS", "1")
    l2 = path_linear_sgd_layout_sweep(g, p, pidx, consensus_every=4)
    import numpy as np

    np.testing.assert_array_equal(l1.coords, l2.coords)
