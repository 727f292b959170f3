"""Checkpoint/resume tests: segmented run equals single-shot run;
resume after interruption continues from the saved cursor."""

from dataclasses import replace

import numpy as np
import pytest

from gfasort_tpu import PathIndex, YgsParams
from gfasort_tpu.checkpoint import (
    fingerprint,
    load_checkpoint,
    path_linear_sgd_checkpointed,
    save_checkpoint,
)
from gfasort_tpu.io import gfa
from gfasort_tpu.ops.sgd import path_linear_sgd_batched


@pytest.fixture
def setup(lil_gfa):
    g = gfa.parse_gfa_numeric(lil_gfa)
    p = replace(
        YgsParams.from_graph(g).path_sgd,
        dtype="float64", pow_mode="fpp", iter_max=20,
    )
    return g, p, PathIndex.from_graph(g)


def test_segmented_equals_single_shot(setup, tmp_path):
    g, p, pidx = setup
    ck = str(tmp_path / "run.ckpt")
    x_seg = path_linear_sgd_checkpointed(g, p, ck, pidx, segment_rounds=7)
    x_one = path_linear_sgd_batched(g, p, pidx)
    np.testing.assert_array_equal(x_seg, x_one)
    assert not (tmp_path / "run.ckpt").exists()  # cleaned on success


def test_resume_from_partial(setup, tmp_path):
    g, p, pidx = setup
    ck = str(tmp_path / "run.ckpt")
    calls = []

    class Stop(Exception):
        pass

    def bail_after_two(nxt, total):
        calls.append(nxt)
        if len(calls) == 2:
            raise Stop()

    with pytest.raises(Stop):
        path_linear_sgd_checkpointed(
            g, p, ck, pidx, segment_rounds=5, progress=bail_after_two
        )
    assert (tmp_path / "run.ckpt").exists()
    # resume and finish
    x_res = path_linear_sgd_checkpointed(g, p, ck, pidx, segment_rounds=5)
    x_one = path_linear_sgd_batched(g, p, pidx)
    np.testing.assert_array_equal(x_res, x_one)


def test_fingerprint_mismatch_rejected(setup, tmp_path):
    g, p, pidx = setup
    ck = str(tmp_path / "run.ckpt")
    fp = fingerprint(p, pidx)
    save_checkpoint(ck, np.zeros(pidx.num_nodes), 5, fp)
    assert load_checkpoint(ck, fp) is not None
    other = replace(p, seed=123)
    with pytest.raises(ValueError, match="different run"):
        load_checkpoint(ck, fingerprint(other, pidx))
