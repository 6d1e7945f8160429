"""Pixel-level golden-image regression tests (SURVEY.md §4b).

Each BASELINE.json ladder fixture (diffuse Cornell, glossy+DoF Cornell,
envmap-NEE demo, nested-dielectric glass box) is rendered at 64^2 and
compared against a committed golden frame (tests/golden/*.npz, produced
by scripts/gen_goldens.py on the same CPU backend these tests run on).

Tolerances are loose enough to survive benign compiler/version float
drift but tight enough that transport regressions — a flipped normal, a
wrong MIS weight, a broken medium stack — shift many pixels and fail.
"""

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _configs():
    import sys

    scripts = pathlib.Path(__file__).resolve().parents[1] / "scripts"
    sys.path.insert(0, str(scripts))
    try:
        from gen_goldens import configs
    finally:
        sys.path.remove(str(scripts))
    return configs()


@pytest.fixture(scope="module")
def golden_configs():
    return _configs()


@pytest.mark.parametrize(
    "name", ["cornell_diffuse", "cornell_glossy_dof", "envmap_nee",
             "glass_box"],
)
@pytest.mark.slow
def test_golden_image(name, golden_configs):
    import halogen_tpu as ht

    path = GOLDEN_DIR / f"{name}.npz"
    assert path.exists(), (
        f"missing golden {path}; regenerate with "
        "`JAX_PLATFORMS=cpu python scripts/gen_goldens.py`"
    )
    golden = np.load(path)["image"]
    scene, cam, st, frame = golden_configs[name]
    img = np.asarray(ht.render_frame(scene, cam, st, frame), np.float32)

    assert img.shape == golden.shape
    assert np.isfinite(img).all()
    # Mean absolute error across the frame: catches broad shifts.
    mae = np.abs(img - golden).mean()
    assert mae < 5e-3, f"{name}: MAE {mae} vs golden"
    # Worst pixel: catches localized breakage (fireflies, dead regions).
    worst = np.abs(img - golden).max()
    assert worst < 0.15, f"{name}: max pixel delta {worst} vs golden"
