"""Renderer tests: furnace closure test (analytic), Cornell-box color
bleeding, mirror/glass geometry, visibility."""

import jax
import jax.numpy as jnp
import numpy as np

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.renderer import Camera, SceneBuilder, scenes
from libfluid_tpu.renderer.pathtrace import trace_rays
from libfluid_tpu.renderer.render import render
from libfluid_tpu.renderer import intersect, materials
from libfluid_tpu.renderer.scene import unit_box


def test_furnace_closed_box():
    """Inside a closed emissive lambertian box, the path-traced radiance is
    exactly E * sum_{k=0}^{B-1} rho^k — cosine sampling cancels the BSDF
    term so the estimator is deterministic."""
    rho, e = 0.6, 0.8
    b = SceneBuilder()
    m = b.lambertian((rho, rho, rho), emission=(e, e, e))
    pos, idx = unit_box()
    b.add_mesh(pos, idx, m, np.asarray([[20.0, 0, 0, 0], [0, 20.0, 0, 0], [0, 0, 20.0, 0]]))
    scene = b.finish()

    cfg = RenderConfig(max_bounces=4)
    key = jax.random.PRNGKey(0)
    n = 256
    o = jnp.zeros((n, 3))
    d = jax.random.normal(key, (n, 3))
    li = trace_rays(scene, o, d, jax.random.PRNGKey(1), cfg)
    expect = e * sum(rho**k for k in range(cfg.max_bounces))
    np.testing.assert_allclose(np.asarray(li), expect, rtol=1e-4)


def test_cornell_box_render():
    builder, cam = scenes.cornell_box_one_light(1.0)
    scene = builder.finish()
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=24, max_bounces=4)
    img = np.asarray(
        jax.jit(render, static_argnums=(2,))(scene, cam, cfg, jax.random.PRNGKey(0))
    )
    assert np.isfinite(img).all() and img.min() >= 0.0
    assert img.mean() > 0.05  # lit scene
    # ceiling light region (top rows, center) is the brightest area
    top = img[: img.shape[0] // 6, 24:40].mean()
    assert top > img.mean()
    # color bleeding at the wall strips: red wall at +x is screen-left,
    # green wall at -x screen-right (the warm light tints everything toward
    # red, so compare each channel across sides rather than within a pixel)
    left = img[16:56, :8]
    right = img[16:56, 56:]
    assert left[..., 0].mean() > 4.0 * left[..., 1].mean()  # strongly red
    assert right[..., 1].mean() > right[..., 0].mean()  # green dominates
    assert left[..., 0].mean() > right[..., 0].mean()
    assert right[..., 1].mean() > left[..., 1].mean()


def test_mirror_reflection_geometry():
    """A mirror floor reflects an emissive patch to the predicted spot."""
    b = SceneBuilder()
    mirror = b.mirror()
    light = b.lambertian((0, 0, 0), emission=(5.0, 5.0, 5.0))
    # mirror floor at y=0
    pos = np.array([[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10.0]])
    idx = np.array([0, 2, 1, 0, 3, 2])
    b.add_mesh(pos, idx, mirror)
    # emissive panel at x in [1,2], y in [1,2], z = 2 facing -z
    ppos = np.array([[1, 1, 2], [2, 1, 2], [2, 2, 2], [1, 2, 2.0]])
    b.add_mesh(ppos, idx, light)
    scene = b.finish()
    cfg = RenderConfig(max_bounces=3)
    # ray toward the floor such that its reflection hits the panel center:
    # aim at floor point (1.5, 0, 0.5) from (1.5, 1.5, -1.0)
    o = jnp.asarray([[1.5, 1.5, -1.0]])
    d = jnp.asarray([[0.0, -1.5, 1.5]])
    li = trace_rays(scene, o, d, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(li)[0], 5.0, rtol=1e-5)
    # a ray whose reflection misses the panel sees nothing
    o2 = jnp.asarray([[5.0, 1.5, -1.0]])
    li2 = trace_rays(scene, o2, d, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(li2)[0], 0.0, atol=1e-6)


def test_glass_ior1_is_transparent():
    """IOR=1 glass transmits straight through with no loss."""
    b = SceneBuilder()
    glass = b.glass(1.0)
    light = b.lambertian((0, 0, 0), emission=(3.0, 3.0, 3.0))
    b.add_sphere(np.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]), glass)
    ppos = np.array([[-1, -1, 5], [1, -1, 5], [1, 1, 5], [-1, 1, 5.0]])
    idx = np.array([0, 1, 2, 0, 2, 3])
    b.add_mesh(ppos, idx, light)
    scene = b.finish()
    cfg = RenderConfig(max_bounces=4)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    li = trace_rays(scene, o, d, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(li)[0], 3.0, rtol=1e-4)


def test_visibility():
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    pos, idx = unit_box()
    b.add_mesh(pos, idx, m)
    scene = b.finish()
    p1 = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 5.0, -5.0]])
    p2 = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 5.0, 5.0]])
    vis = np.asarray(intersect.test_visibility(scene, p1, p2))
    assert not vis[0]  # blocked by the box
    assert vis[1]  # clear above it


def test_render_gradients_wrt_emission():
    """Pixel gradients flow to material emission (a first slice of the
    differentiable-rendering gate; geometry gradients come with NEE/reparam)."""
    builder, cam = scenes.cornell_box_one_light(1.0)
    scene = builder.finish()
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=4, max_bounces=3)

    def loss(emission_table):
        s = scene._replace(
            materials=scene.materials._replace(emission=emission_table)
        )
        img = render(s, cam, cfg, jax.random.PRNGKey(0))
        return jnp.mean(img)

    g = jax.grad(loss)(scene.materials.emission)
    gn = np.asarray(g)
    assert np.isfinite(gn).all()
    light_mat = np.asarray(scene.materials.emission).sum(-1).argmax()
    assert gn[light_mat].sum() > 0
    # finite-difference check
    eps = 0.1
    e0 = scene.materials.emission
    probe = jnp.zeros_like(e0).at[light_mat, 0].set(1.0)
    fd = (loss(e0 + eps * probe) - loss(e0 - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, probe)), float(fd), rtol=1e-3)
