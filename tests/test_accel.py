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
