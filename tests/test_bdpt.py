"""BDPT tests: subpath bookkeeping, MIS normalization on direct hits, and
agreement with the (unbiased) naive path tracer on the Cornell box."""

import pytest

pytestmark = pytest.mark.slow  # BDPT consistency renders
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.renderer import bdpt, scenes
from libfluid_tpu.renderer.render import render


def _cornell():
    builder, cam = scenes.cornell_box_one_light(1.0)
    return builder.finish(), cam


def test_subpath_shapes_and_masks():
    scene, cam = _cornell()
    r = 64
    key = jax.random.PRNGKey(0)
    sp = jnp.stack(
        [jnp.linspace(0.2, 0.8, r), jnp.full((r,), 0.5)], axis=-1
    )
    o, d = cam.get_rays(sp)
    sub = bdpt.trace_subpath(
        scene, o, d, jnp.ones((r, 3)), jnp.ones((r,)), o,
        d / jnp.linalg.norm(d, axis=-1, keepdims=True), key, 4, 0
    )
    assert sub.pos.shape == (4, r, 3)
    # rays into the box must hit something on the first bounce
    assert bool(jnp.all(sub.valid[0]))
    # valid vertices have positive forward pdfs
    assert bool(jnp.all(jnp.where(sub.valid, sub.pdf_fwd, 1.0) > 0.0))
    # beta at the first vertex is the initial throughput
    np.testing.assert_allclose(np.asarray(sub.beta[0]), 1.0)


def test_light_sampling_pdf():
    scene, _ = _cornell()
    ls = bdpt.sample_light_point(scene, jax.random.PRNGKey(1), 256)
    assert bool(jnp.all(ls.valid))
    total_area = float(jnp.sum(jnp.where(scene.light_mask, scene.light_area, 0.0)))
    np.testing.assert_allclose(np.asarray(ls.pdf_area), 1.0 / total_area, rtol=1e-5)
    # sampled points lie on emissive triangles: emission positive
    assert bool(jnp.all(jnp.max(ls.emission, axis=-1) > 0.0))


def test_bdpt_finite_nonnegative():
    scene, cam = _cornell()
    cfg = RenderConfig(
        width=16, height=16, samples_per_pixel=4, algorithm="bdpt",
        max_camera_bounces=4, max_light_bounces=4,
    )
    img = render(scene, cam, cfg, jax.random.PRNGKey(2))
    a = np.asarray(img)
    assert np.all(np.isfinite(a))
    assert np.all(a >= 0.0)
    assert a.max() > 0.0  # something is lit


def test_bdpt_matches_pt_on_cornell():
    """Both integrators are unbiased for the same scene, so their means must
    agree; BDPT should need far fewer samples for the same error, but here we
    just check consistency (the reference's golden-image parity, SURVEY §4)."""
    scene, cam = _cornell()
    kw = dict(width=24, height=24, max_bounces=5,
              max_camera_bounces=5, max_light_bounces=5)
    cfg_pt = RenderConfig(samples_per_pixel=256, algorithm="pt", **kw)
    cfg_bd = RenderConfig(samples_per_pixel=48, algorithm="bdpt", **kw)
    img_pt = np.asarray(render(scene, cam, cfg_pt, jax.random.PRNGKey(3)))
    img_bd = np.asarray(render(scene, cam, cfg_bd, jax.random.PRNGKey(4)))
    # compare softly-blurred images (estimator noise) on mean and per-pixel
    assert abs(img_pt.mean() - img_bd.mean()) / img_pt.mean() < 0.08
    k = 3
    blur_pt = img_pt.reshape(8, k, 8, k, 3).mean((1, 3))
    blur_bd = img_bd.reshape(8, k, 8, k, 3).mean((1, 3))
    denom = np.maximum(blur_pt, 0.05)
    rel = np.abs(blur_pt - blur_bd) / denom
    assert np.median(rel) < 0.15, f"median rel err {np.median(rel)}"


def test_bdpt_glass_scene_consistent_with_pt():
    """Delta BSDFs (mirror/glass) exercise the delta-skip terms of the MIS
    sweep; means must still agree with the naive tracer."""
    builder, cam = scenes.glass_ball_box(1.0)
    scene = builder.finish()
    kw = dict(width=16, height=16, max_bounces=6,
              max_camera_bounces=6, max_light_bounces=6)
    img_pt = np.asarray(
        render(scene, cam, RenderConfig(samples_per_pixel=384, algorithm="pt", **kw),
               jax.random.PRNGKey(5))
    )
    img_bd = np.asarray(
        render(scene, cam, RenderConfig(samples_per_pixel=64, algorithm="bdpt", **kw),
               jax.random.PRNGKey(6))
    )
    assert np.all(np.isfinite(img_bd)) and np.all(img_bd >= 0.0)
    assert abs(img_pt.mean() - img_bd.mean()) / max(img_pt.mean(), 1e-6) < 0.12
