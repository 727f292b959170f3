"""Native GFA parser parity tests."""

import numpy as np
import pytest

from gfasort_tpu.io import gfa
from gfasort_tpu.io.fast_gfa import parse_gfa_numeric_fast

needs_native = pytest.mark.skipif(
    not __import__("gfasort_tpu.native", fromlist=["available"]).available(),
    reason="no C++ toolchain",
)


@needs_native
@pytest.mark.parametrize("name", ["simple.gfa", "lil.gfa", "DRB1-3123.gfa"])
def test_fast_parser_identical(data_dir, name):
    text = (data_dir / name).read_text()
    gf = parse_gfa_numeric_fast(text)
    gp = gfa.parse_gfa_numeric(text)
    assert gf.nodes == gp.nodes
    assert gf.edges == gp.edges
    assert gf.node_order == gp.node_order
    assert len(gf.paths) == len(gp.paths)
    for p1, p2 in zip(gf.paths, gp.paths):
        assert p1.name == p2.name
        assert np.array_equal(p1.steps, p2.steps)


@needs_native
def test_fast_parser_edge_dedup():
    text = "S\t1\tA\nS\t2\tC\nL\t1\t+\t2\t+\t0M\nL\t2\t-\t1\t-\t0M\n"
    g = parse_gfa_numeric_fast(text)
    assert len(g.edges) == 1


@needs_native
def test_fast_parser_bad_id():
    with pytest.raises(ValueError):
        parse_gfa_numeric_fast("S\tfoo\tACGT\n")


@needs_native
def test_fast_parser_roundtrip_canonical(simple_gfa):
    g = parse_gfa_numeric_fast(simple_gfa)
    assert gfa.canonical_gfa(g) == gfa.canonical_gfa(
        gfa.parse_gfa_numeric(simple_gfa)
    )
