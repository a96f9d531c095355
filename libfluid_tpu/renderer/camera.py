"""Pinhole camera (reference ``camera.h``/``camera.cpp``).

``from_parameters`` reproduces ``camera::from_parameters``
(``camera.cpp:9-24``): forward plus half-extent vectors scaled by
tan(fovy/2); ``get_ray`` maps screen positions in [0,1]^2 through
screen*2-1 (``camera.cpp:26-32``). Ray directions are unnormalized, exactly
like the reference (the tracers normalize).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Camera(NamedTuple):
    position: jnp.ndarray  # (3,)
    norm_forward: jnp.ndarray  # (3,)
    half_horizontal: jnp.ndarray  # (3,)
    half_vertical: jnp.ndarray  # (3,)

    @staticmethod
    def from_parameters(position, ref, up, fovy_radians, aspect_ratio) -> "Camera":
        position = jnp.asarray(position, jnp.float32)
        ref = jnp.asarray(ref, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        fwd = ref - position
        fwd = fwd / jnp.linalg.norm(fwd)
        tan_half = jnp.tan(0.5 * fovy_radians)
        hh = jnp.cross(fwd, up)
        nrm = jnp.linalg.norm(hh)
        # degenerate up || forward: fall back to an arbitrary perpendicular
        fallback = jnp.cross(fwd, jnp.asarray([1.0, 0.0, 0.0]))
        hh = jnp.where(nrm > 1e-12, hh / jnp.maximum(nrm, 1e-30), fallback)
        hv = jnp.cross(fwd, hh)
        return Camera(
            position=position,
            norm_forward=fwd,
            half_horizontal=hh * tan_half * aspect_ratio,
            half_vertical=hv * tan_half,
        )

    def get_rays(self, screen_pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """screen_pos (..., 2) in [0,1]^2 -> (origins, directions)."""
        sp = screen_pos * 2.0 - 1.0
        d = (
            self.norm_forward
            + sp[..., 0:1] * self.half_horizontal
            + sp[..., 1:2] * self.half_vertical
        )
        o = jnp.broadcast_to(self.position, d.shape)
        return o, d
