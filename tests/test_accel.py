"""Uniform-grid ray accelerator: equivalence with the brute-force scan.

The accelerator must be invisible to the renderer (``aabb_tree.cpp`` is to
``scene::ray_cast`` what :mod:`renderer.accel` is to
:func:`intersect.ray_cast`): same nearest hit, any scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libfluid_tpu.renderer import accel as accel_mod
from libfluid_tpu.renderer import intersect, scenes
from libfluid_tpu.renderer.scene import SceneBuilder


def _random_rays(key, n, lo, hi):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=lo, maxval=hi)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _assert_same_hits(scene, o, d, atol=1e-4):
    brute = intersect.ray_cast(scene, o, d)
    acc = scene._replace(accel=accel_mod.build(scene, res=(16, 16, 16)))
    fast = intersect.ray_cast(acc, o, d)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(fast.hit))
    h = np.asarray(brute.hit)
    np.testing.assert_allclose(
        np.asarray(brute.t)[h], np.asarray(fast.t)[h], rtol=1e-5, atol=atol
    )
    # the same primitive (or a coplanar twin at equal t): material must match
    np.testing.assert_array_equal(
        np.asarray(brute.mat_id)[h], np.asarray(fast.mat_id)[h]
    )


def test_cornell_box_equivalence():
    builder, _cam = scenes.cornell_box_one_light(1.0)
    scene = builder.finish()
    o, d = _random_rays(jax.random.PRNGKey(0), 256, -0.4, 0.4)
    _assert_same_hits(scene, o, d)


def test_random_soup_equivalence():
    rng = np.random.RandomState(7)
    base = rng.uniform(-1.0, 1.0, (400, 1, 3))
    tris = base + rng.uniform(-0.08, 0.08, (400, 3, 3))
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    b.add_triangle_soup(tris, m)
    scene = b.finish()
    o, d = _random_rays(jax.random.PRNGKey(1), 512, -1.2, 1.2)
    _assert_same_hits(scene, o, d)


def test_mixed_scales_and_spheres():
    rng = np.random.RandomState(3)
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    # big floor + walls (go to the big list) + small soup (grid lists)
    floor = np.array([[[-5, -1, -5], [5, -1, -5], [5, -1, 5]],
                      [[-5, -1, -5], [5, -1, 5], [-5, -1, 5]]], float)
    b.add_triangle_soup(floor, m)
    soup = rng.uniform(-1, 1, (200, 1, 3)) + rng.uniform(-0.05, 0.05, (200, 3, 3))
    b.add_triangle_soup(soup, m)
    t = np.zeros((3, 4))
    t[:, :3] = np.eye(3) * 0.3
    t[:, 3] = (0.2, 0.1, -0.2)
    b.add_sphere(t, m)
    scene = b.finish()
    o, d = _random_rays(jax.random.PRNGKey(2), 512, -1.5, 1.5)
    _assert_same_hits(scene, o, d)


def test_big_overflow_counts():
    builder, _cam = scenes.cornell_box_one_light(1.0)
    scene = builder.finish()
    acc = accel_mod.build(scene, res=(8, 8, 8), big_capacity=4)
    assert int(acc.big_overflow) > 0  # cornell has > 4 wall-scale tris
    acc = accel_mod.build(scene, res=(8, 8, 8))
    assert int(acc.big_overflow) == 0


def test_jit_build_and_traverse():
    """The whole build+cast pipeline must be jittable (fresh fluid meshes
    re-accelerate on device every frame)."""
    rng = np.random.RandomState(11)
    soup = rng.uniform(-1, 1, (64, 1, 3)) + rng.uniform(-0.1, 0.1, (64, 3, 3))
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    b.add_triangle_soup(soup, m)
    scene = b.finish()

    @jax.jit
    def cast(scene, o, d):
        acc = scene._replace(accel=accel_mod.build(scene, res=(16, 16, 16)))
        return intersect.ray_cast(acc, o, d)

    o, d = _random_rays(jax.random.PRNGKey(4), 128, -1.2, 1.2)
    rec = cast(scene, o, d)
    brute = intersect.ray_cast(scene, o, d)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(rec.hit))


def test_fine_grid_still_exact():
    """Accel cells up to max_span (=2x) FINER than the triangles must stay
    exact: r5 found triangles spanning 2 cells/axis being silently dropped
    past the big-list capacity at over-resolution (12% nearest-hit mismatch
    at res 2-3x the geometry scale)."""
    rng = np.random.default_rng(4)
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    # triangle soup with extents ~1 unit in an 8-unit box
    ctr = rng.uniform(1.5, 6.5, (80, 3))
    verts = np.concatenate(
        [c + rng.normal(0, 0.4, (3, 3)) for c in ctr], axis=0
    )
    tris = np.arange(240).reshape(80, 3)
    b.add_mesh(verts, tris, m)
    scene = b.finish()

    o = jnp.asarray(rng.uniform(0, 8, (512, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect.ray_cast(scene._replace(accel=None), o, d)
    # 16 cells over 8 units = 0.5-unit cells, ~2x finer than the triangles
    acc = scene._replace(accel=accel_mod.build(scene, res=(16, 16, 16)))
    got = intersect.ray_cast(acc, o, d)
    assert int(acc.accel.big_overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(got.prim_id), np.asarray(ref.prim_id)
    )
