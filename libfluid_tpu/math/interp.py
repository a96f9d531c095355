"""Linear interpolation helpers (reference ``include/fluid/misc.h:20-36``)."""

from __future__ import annotations

import jax.numpy as jnp


def lerp(a, b, t):
    """a + (b - a) * t, elementwise."""
    return a + (b - a) * t


def bilerp(v00, v01, v10, v11, tx, ty):
    """Bilinear interpolation; ``v{y}{x}`` convention, tx varies fastest."""
    return lerp(lerp(v00, v01, tx), lerp(v10, v11, tx), ty)


def trilerp(v000, v001, v010, v011, v100, v101, v110, v111, tx, ty, tz):
    """Trilinear interpolation; ``v{z}{y}{x}`` convention (ref misc.h:30-36)."""
    return lerp(
        bilerp(v000, v001, v010, v011, tx, ty),
        bilerp(v100, v101, v110, v111, tx, ty),
        tz,
    )


def hat(x):
    """The trilinear "hat" kernel max(0, 1-|x|) per component, multiplied.

    Reference ``simulation.cpp:207-213`` (`_kernel`): the P2G/G2P weight for a
    particle-face offset measured in cell units. `x` has trailing axis 3.
    """
    return jnp.prod(jnp.maximum(0.0, 1.0 - jnp.abs(x)), axis=-1)


def grad_hat(x, cell_size):
    """Gradient of :func:`hat` with respect to world-space position.

    Reference ``simulation.cpp:215-224`` (`_grad_kernel`): sign(x) convention
    is -1 for x>0 else +1, divided by cell_size. `x` in cell units, trailing
    axis 3; returns the same shape.
    """
    neg_sign = jnp.where(x > 0.0, -1.0, 1.0)
    n = 1.0 - jnp.abs(x)
    gx = neg_sign[..., 0] * n[..., 1] * n[..., 2]
    gy = n[..., 0] * neg_sign[..., 1] * n[..., 2]
    gz = n[..., 0] * n[..., 1] * neg_sign[..., 2]
    return jnp.stack([gx, gy, gz], axis=-1) / cell_size
