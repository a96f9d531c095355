"""Naive forward path tracer as a masked wavefront loop.

Reference ``path_tracer::incoming_light`` (``path_tracer.cpp:12-39``): up to
``max_bounces`` bounces, accumulate emission x throughput at every hit, sample
the BSDF for the next ray; no next-event estimation, no Russian roulette —
same estimator here, but over a whole ray batch at once with an alive mask
instead of per-ray recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.renderer import intersect, materials
from libfluid_tpu.renderer.scene import Scene

_RAY_OFFSET = 1e-3  # spawned-ray normal offset (ref scene.h:31 default 1e-6;
# float32 needs a larger skin than the reference's double)


def trace_rays(
    scene: Scene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    key: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Incoming radiance (R, 3) for each ray."""
    r = origins.shape[0]
    d = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-30
    )

    radiance = jnp.zeros((r, 3), origins.dtype)
    throughput = jnp.ones((r, 3), origins.dtype)
    alive = jnp.ones((r,), bool)
    o = origins

    def bounce(carry, k):
        o, d, radiance, throughput, alive = carry
        rec = intersect.ray_cast(scene, o, d)
        live_hit = alive & rec.hit

        emis = materials.emission_at(scene.materials, rec.mat_id, rec.uv)
        radiance = radiance + jnp.where(
            live_hit[:, None], throughput * emis, 0.0
        )

        frame = intersect.tangent_frame(rec.normal)  # world -> tangent
        win = jnp.einsum("rij,rj->ri", frame, -d)
        xi = jax.random.uniform(k, (r, 2), o.dtype)
        samp = materials.sample_bsdf(scene.materials, rec.mat_id, win, xi, uv=rec.uv)
        atten = samp.reflectance * (
            jnp.abs(samp.direction[..., 1]) / jnp.maximum(samp.pdf, 1e-12)
        )[..., None]

        new_d = jnp.einsum("rji,rj->ri", frame, samp.direction)  # tangent->world
        offset_sign = jnp.where(samp.direction[..., 1] > 0.0, 1.0, -1.0)
        new_o = rec.position + rec.normal * (offset_sign * _RAY_OFFSET)[:, None]

        throughput = jnp.where(live_hit[:, None], throughput * atten, throughput)
        alive = live_hit & (jnp.max(throughput, axis=-1) > 1e-7) & (samp.pdf > 1e-12)
        o = jnp.where(live_hit[:, None], new_o, o)
        d = jnp.where(live_hit[:, None], new_d, d)
        return (o, d, radiance, throughput, alive), None

    keys = jax.random.split(key, cfg.max_bounces)
    (o, d, radiance, throughput, alive), _ = jax.lax.scan(
        bounce, (o, d, radiance, throughput, alive), keys
    )
    return radiance
