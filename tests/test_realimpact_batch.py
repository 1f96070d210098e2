"""Corpus batch-solve driver over synthetic RealImpact doubles: per-object profile
rows plus the object-sharded verification render on the virtual 8-device mesh
(reference: ModalSolverBench corpus rows, /root/reference/tests/ModalSolverBench.cpp:28-80)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "scripts"))

from make_realimpact_double import make_double  # noqa: E402
from realimpact_batch import batch_solve, sharded_verification_render  # noqa: E402

TINY = dict(radius=0.05, thickness=0.004, n_lat=5, n_lon=12, noise=0.05)


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ri_corpus")
    make_double(root, name="1_CeramicKoiBowl", frames=4800, tet_resolution=6,
                n_modes=10, bowl_kw=TINY, seed=3)
    make_double(root, name="2_GlassGoblet", frames=4800, tet_resolution=6,
                n_modes=10, bowl_kw=dict(TINY, radius=0.04), seed=5)
    return root


class TestBatchSolve:
    def test_rows_and_sharded_render(self, corpus_root):
        rows, results = batch_solve(str(corpus_root), tet_resolution=6, n_modes=12,
                                    progress=None)
        assert len(rows) == 2
        for row in rows:
            assert row["modes"] > 0, row
            assert 100.0 < row["f1_hz"] < 24_000.0, row
            assert row["dofs"] > 0 and row["solve_s"] > 0
            assert set(row["stage_s"]) == {"mesh", "assemble", "factorize",
                                           "iterate", "extract"}
        # Material mapping flows from the directory name.
        assert {r["material"] for r in rows} == {"Ceramic", "Glass"}

        mix = sharded_verification_render(results, n_devices=8)
        assert mix.shape == (512,)
        assert np.isfinite(mix).all()
        assert np.abs(mix).max() > 0, "struck bank rendered silence"
