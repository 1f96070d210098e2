"""Render corpus goldens: every committed scene re-renders pixel-equal (within one
quantization step) to its fixture PNG — the reference's committed-render diff oracle
(/root/reference/script/Render:1-40, README.md:184-197). Regenerate with
`python scripts/render_corpus.py` after an intentional renderer change; `git status`
then shows exactly which scenes moved."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "scripts"))

from render_corpus import FIXTURE_DIR, SCENES, render_case  # noqa: E402


def _load_png(path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden(name):
    golden_path = os.path.join(FIXTURE_DIR, f"{name}.png")
    assert os.path.exists(golden_path), (
        f"missing golden for {name}; run scripts/render_corpus.py and commit")
    golden = _load_png(golden_path)
    img = render_case(name)
    assert img.shape == golden.shape
    # One quantization step of slack absorbs round-to-nearest flips on exact .5
    # boundaries across BLAS/XLA versions (the COMPARE_VIDEOS noise-filter analog);
    # anything larger is a real shading change.
    diff = np.abs(img.astype(np.int16) - golden.astype(np.int16))
    assert diff.max() <= 1, f"{name}: max pixel diff {diff.max()}"
