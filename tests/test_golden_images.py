"""Golden-image regression (VERDICT r2 next #10).

The reference ships committed renders as its de-facto golden tests
(``renders/tide.png`` etc., SURVEY §4); here two 64x64 renders of the
standard scenes (``test_scenes.cpp:203-277``) are committed as npz and every
run must match them to Monte-Carlo-noise PSNR. Catches estimator regressions
(MIS weights, Fresnel, textures, accel) mechanically: a systematic shift of
a few percent drops PSNR far below the threshold, while an independent
128-spp rerun of the same estimator lands well above it.
"""

import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.renderer import scenes
from libfluid_tpu.renderer.render import render

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CFG = RenderConfig(width=64, height=64, samples_per_pixel=128, max_bounces=5)


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    peak = float(max(a.max(), b.max(), 1e-6))
    return 10.0 * np.log10(peak * peak / max(mse, 1e-20))


@pytest.mark.parametrize(
    "name,mk",
    [("cornell", scenes.cornell_box_one_light), ("glass", scenes.glass_ball_box)],
)
def test_golden_render(name, mk):
    golden = np.load(os.path.join(_GOLDEN, f"{name}_64.npz"))["img"]
    b, cam = mk(1.0)
    # a DIFFERENT key than the golden (7 vs 42): the comparison must hold
    # across independent Monte-Carlo runs, not bit-reproduce one
    img = np.asarray(render(b.finish(), cam, CFG, jax.random.PRNGKey(7)))
    assert np.isfinite(img).all()
    p = _psnr(img, golden)
    assert p > 26.0, f"{name}: PSNR {p:.1f} dB vs golden (estimator drift?)"
    # means must agree tightly (unbiasedness)
    np.testing.assert_allclose(img.mean(), golden.mean(), rtol=0.03)
