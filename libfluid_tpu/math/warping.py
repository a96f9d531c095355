"""Sample warping: unit square -> disk / sphere / hemisphere distributions.

Reference ``src/math/warping.cpp``. All functions are batched: `xi` is (..., 2)
uniform samples in [0,1)^2; outputs have trailing axis 2 or 3. PDFs match the
reference's conventions (solid-angle measure).
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = jnp.pi


def unit_disk_from_unit_square(xi):
    """Polar warp square->disk (ref ``warping.cpp:11-14``)."""
    r = jnp.sqrt(xi[..., 0])
    theta = 2.0 * _PI * xi[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def unit_disk_from_unit_square_concentric(xi):
    """Shirley–Chiu concentric disk warp (ref ``warping.cpp:16-38``).

    Lower distortion than the polar warp; used by cosine hemisphere sampling.
    """
    offset = 2.0 * xi - 1.0
    ox, oy = offset[..., 0], offset[..., 1]
    degenerate = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe = jnp.where(degenerate, 1.0, jnp.where(use_x, ox, oy))
    theta = jnp.where(
        use_x,
        (_PI / 4.0) * (oy / safe),
        (_PI / 2.0) - (_PI / 4.0) * (ox / safe),
    )
    pt = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(degenerate[..., None], 0.0, pt)


def unit_sphere_from_unit_square(xi):
    """Uniform sphere (ref ``warping.cpp:45-51``)."""
    z = 1.0 - 2.0 * xi[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * _PI * xi[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def pdf_unit_sphere():
    return 1.0 / (4.0 * _PI)


def unit_hemisphere_from_unit_square(xi):
    """Uniform hemisphere around +z (ref ``warping.cpp:56-62``)."""
    z = xi[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * _PI * xi[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def pdf_unit_hemisphere():
    return 1.0 / (2.0 * _PI)


def unit_hemisphere_cosine_from_unit_square(xi):
    """Cosine-weighted hemisphere via concentric disk lift (ref ``warping.cpp:66-71``)."""
    d = unit_disk_from_unit_square_concentric(xi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def pdf_unit_hemisphere_cosine(direction):
    """cos(theta)/pi; `direction` in local frame with +z = normal (ref ``warping.cpp:73-75``)."""
    return jnp.abs(direction[..., 2]) / _PI
