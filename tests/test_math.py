"""Unit tests for the math substrate (reference L1 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libfluid_tpu.math import interp, intersection, transforms, warping


def test_trilerp_corners():
    vals = np.arange(8.0)
    # corner (tx,ty,tz)=(0,0,0) -> v000; (1,1,1) -> v111
    assert interp.trilerp(*vals, 0.0, 0.0, 0.0) == vals[0]
    assert interp.trilerp(*vals, 1.0, 1.0, 1.0) == vals[7]
    mid = interp.trilerp(*vals, 0.5, 0.5, 0.5)
    assert np.isclose(mid, vals.mean())


def test_hat_kernel_partition_of_unity():
    # hat weights over the 8 surrounding nodes sum to 1 for any point
    rng = np.random.default_rng(0)
    frac = jnp.asarray(rng.uniform(0, 1, (32, 3)))
    total = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                off = jnp.asarray([dx, dy, dz], jnp.float32)
                total = total + interp.hat(frac - off)
    np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-5)


def test_grad_hat_matches_fd():
    f = lambda x: interp.hat(x / 2.0)  # cell size 2: hat takes cell units
    x0 = jnp.asarray([0.3, -0.4, 0.7])
    g = interp.grad_hat(x0 / 2.0, 2.0)
    eps = 1e-4
    for d in range(3):
        e = jnp.zeros(3).at[d].set(eps)
        fd = (f(x0 + e) - f(x0 - e)) / (2 * eps)
        np.testing.assert_allclose(g[d], fd, rtol=1e-3)


def test_ray_triangle():
    p0 = jnp.array([0.0, 0.0, 0.0])
    e1 = jnp.array([1.0, 0.0, 0.0])
    e2 = jnp.array([0.0, 1.0, 0.0])
    origin = jnp.array([0.25, 0.25, 1.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    hit, t, u, v = intersection.ray_triangle(origin, direction, p0, e1, e2)
    assert bool(hit)
    np.testing.assert_allclose(t, 1.0, rtol=1e-6)
    np.testing.assert_allclose([u, v], [0.25, 0.25], rtol=1e-6)
    # miss outside the triangle
    hit2, *_ = intersection.ray_triangle(
        jnp.array([0.9, 0.9, 1.0]), direction, p0, e1, e2
    )
    assert not bool(hit2)


def test_ray_aabb():
    origin = jnp.array([-2.0, 0.5, 0.5])
    d = jnp.array([1.0, 0.0, 0.0])
    hit, tn = intersection.ray_aabb(origin, 1.0 / d, jnp.zeros(3), jnp.ones(3))
    assert bool(hit)
    np.testing.assert_allclose(tn, 2.0, rtol=1e-6)
    hit2, _ = intersection.ray_aabb(
        jnp.array([-2.0, 5.0, 0.5]), 1.0 / d, jnp.zeros(3), jnp.ones(3)
    )
    assert not bool(hit2)


def test_ray_unit_sphere():
    hit, t = intersection.ray_unit_sphere(
        jnp.array([0.0, 0.0, -3.0]), jnp.array([0.0, 0.0, 1.0])
    )
    assert bool(hit)
    np.testing.assert_allclose(t, 2.0, rtol=1e-6)
    # from inside: far root
    hit2, t2 = intersection.ray_unit_sphere(
        jnp.zeros(3), jnp.array([0.0, 0.0, 1.0])
    )
    assert bool(hit2)
    np.testing.assert_allclose(t2, 1.0, rtol=1e-6)


def test_aabb_triangle_overlap():
    c = jnp.zeros(3)
    h = jnp.full(3, 0.5)
    tri_in = intersection.aabb_triangle(
        c, h, jnp.array([0.0, 0.0, 0.0]), jnp.array([0.2, 0.0, 0.0]), jnp.array([0.0, 0.2, 0.0])
    )
    assert bool(tri_in)
    tri_out = intersection.aabb_triangle(
        c, h, jnp.array([2.0, 2.0, 2.0]), jnp.array([2.2, 2.0, 2.0]), jnp.array([2.0, 2.2, 2.0])
    )
    assert not bool(tri_out)
    # large triangle slicing through the box without vertices inside
    tri_slice = intersection.aabb_triangle(
        c, h, jnp.array([-5.0, -5.0, 0.1]), jnp.array([5.0, -5.0, 0.1]), jnp.array([0.0, 10.0, 0.1])
    )
    assert bool(tri_slice)


def test_warping_distributions():
    key = jax.random.PRNGKey(0)
    xi = jax.random.uniform(key, (20000, 2))
    d = warping.unit_disk_from_unit_square_concentric(xi)
    r = np.linalg.norm(np.asarray(d), axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform on disk: mean r = 2/3
    np.testing.assert_allclose(r.mean(), 2.0 / 3.0, atol=0.01)

    s = warping.unit_sphere_from_unit_square(xi)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s), axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s).mean(axis=0), 0.0, atol=0.02)

    hc = warping.unit_hemisphere_cosine_from_unit_square(xi)
    assert np.asarray(hc[..., 2]).min() >= -1e-6
    # cosine-weighted: E[cos theta] = 2/3
    np.testing.assert_allclose(np.asarray(hc[..., 2]).mean(), 2.0 / 3.0, atol=0.01)


def test_transform_roundtrip():
    m = transforms.scale_rotate_translate(
        jnp.array([1.5, 2.0, 0.5]),
        jnp.array([0.3, -0.2, 1.1]),
        jnp.array([1.0, 2.0, 3.0]),
    )
    minv = transforms.inverse(m)
    p = jnp.asarray(np.random.default_rng(1).normal(size=(10, 3)))
    back = transforms.apply_point(minv, transforms.apply_point(m, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)
