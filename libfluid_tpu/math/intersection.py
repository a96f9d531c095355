"""Geometric intersection tests, batched over rays/primitives.

Reference ``src/math/intersection.cpp``. Convention differences from the
reference: instead of "NaN t = miss" (``intersection.h:26-28``) every test
returns an explicit boolean hit mask alongside t — masks compose cleanly with
``jnp.where`` / wavefront tracing and avoid NaN-propagation hazards in
gradients. All inputs broadcast; trailing axis 3.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 3.0e38  # sentinel "infinite" t that is finite in float32


def ray_triangle(origin, direction, p0, e1, e2, eps=1e-9):
    """Möller–Trumbore ray/triangle test (ref ``intersection.cpp:92-119``).

    Triangle given as a vertex `p0` and edge vectors `e1 = p1-p0`,
    `e2 = p2-p0`. Returns (hit, t, u, v) with barycentrics u along e1 and v
    along e2; hits require t > 0 and u,v in the unit triangle.
    """
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # Non-culling variant: both orientations hit; guard tiny determinants.
    valid = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tvec = origin - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    return hit, jnp.where(hit, t, _BIG), u, v


def ray_aabb(origin, inv_direction, box_min, box_max, t_max=_BIG):
    """Slab test (ref ``intersection.cpp:123-158``). Expects 1/direction.

    Returns (hit, t_near): hit if the ray segment (0, t_max) overlaps the box.
    """
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_max)
    return hit, jnp.maximum(tmin, 0.0)


def ray_unit_sphere(origin, direction):
    """Ray against the unit sphere at the origin (ref ``intersection.cpp:161-176``).

    Returns (hit, t) for the nearest positive root.
    """
    a = jnp.sum(direction * direction, axis=-1)
    b = 2.0 * jnp.sum(origin * direction, axis=-1)
    c = jnp.sum(origin * origin, axis=-1) - 1.0
    disc = b * b - 4.0 * a * c
    has_root = disc >= 0.0
    # double-where: sqrt'(0) is inf, and `maximum` routes disc < 0 lanes to
    # exactly 0 — the 0-cotangent times inf NaNs every VJP that passes
    # through the ray chain (differentiable-geometry rendering)
    sq = jnp.where(
        has_root, jnp.sqrt(jnp.where(has_root, disc, 1.0)), 0.0
    )
    t_near = (-b - sq) / (2.0 * a)
    t_far = (-b + sq) / (2.0 * a)
    t = jnp.where(t_near > 0.0, t_near, t_far)
    hit = has_root & (t > 0.0)
    return hit, jnp.where(hit, t, _BIG)


def aabb_triangle(box_center, box_half, p0, p1, p2):
    """Separating-axis AAB/triangle overlap (Akenine-Möller; ref ``intersection.cpp:10-82``).

    Used by the voxelizer for conservative surface voxelization. All inputs
    broadcast; returns a boolean overlap mask.
    """
    v0 = p0 - box_center
    v1 = p1 - box_center
    v2 = p2 - box_center
    e0 = v1 - v0
    e1 = v2 - v1
    e2 = v0 - v2

    # 1) box axes: triangle AABB vs box.
    tri_min = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_max = jnp.maximum(jnp.maximum(v0, v1), v2)
    sep_box = jnp.any((tri_min > box_half) | (tri_max < -box_half), axis=-1)

    # 2) triangle normal plane vs box.
    n = jnp.cross(e0, e1)
    d = -jnp.sum(n * v0, axis=-1)
    r = jnp.sum(box_half * jnp.abs(n), axis=-1)
    sep_plane = (d > r) | (d < -r)

    # 3) the nine cross-product axes a = e_i x unit_j.
    def axis_test(axis):
        p_0 = jnp.sum(axis * v0, axis=-1)
        p_1 = jnp.sum(axis * v1, axis=-1)
        p_2 = jnp.sum(axis * v2, axis=-1)
        lo = jnp.minimum(jnp.minimum(p_0, p_1), p_2)
        hi = jnp.maximum(jnp.maximum(p_0, p_1), p_2)
        rad = jnp.sum(box_half * jnp.abs(axis), axis=-1)
        return (lo > rad) | (hi < -rad)

    units = jnp.eye(3)
    sep_cross = jnp.zeros(jnp.broadcast_shapes(sep_box.shape), dtype=bool)
    for edge in (e0, e1, e2):
        for j in range(3):
            axis = jnp.cross(jnp.broadcast_to(units[j], edge.shape), edge)
            sep_cross = sep_cross | axis_test(axis)

    return ~(sep_box | sep_plane | sep_cross)
