"""Render drivers: pixel-grid sampling loops.

Reference ``render_naive``/``accumulate_naive`` (``rendering.h:18-125``):
per-pixel spp loop with jittered rays, OpenMP-over-rows, per-thread pcg32.
Here: the whole image is a flat ray batch; a ``lax.scan`` over samples adds
one jittered sample per pixel per iteration; RNG is a counter-based key so
results are deterministic and device-count independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.renderer import bdpt as bdpt_mod
from libfluid_tpu.renderer.camera import Camera
from libfluid_tpu.renderer.pathtrace import (
    trace_persistent,
    trace_rays as trace_rays_pt,
)
from libfluid_tpu.renderer.scene import Scene


def render(scene: Scene, camera: Camera, cfg: RenderConfig, key) -> jnp.ndarray:
    """Render an (H, W, 3) radiance image with cfg.samples_per_pixel jittered
    samples (``render_naive``, ``rendering.h:43-66``). ``cfg.algorithm``
    picks the integrator, like the reference testbed's tracer switch."""
    if cfg.algorithm != "bdpt" and not cfg.differentiable:
        # forward-only PT: persistent-threads wavefront — dead lanes respawn
        # the next pixel sample instead of idling, so wall-clock follows rays
        # actually cast (pathtrace.trace_persistent). Same estimator.
        img = trace_persistent(scene, camera, cfg, key)
        return img / cfg.samples_per_pixel

    trace_rays = (
        bdpt_mod.trace_rays if cfg.algorithm == "bdpt" else trace_rays_pt
    )
    w, h = cfg.width, cfg.height
    px = jnp.arange(w, dtype=jnp.float32)
    py = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(px, py, indexing="xy")  # (h, w)
    base = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (h*w, 2)
    inv = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)

    # ray-strip batching: one traced strip instance via lax.map, so big
    # images don't put the whole pixel grid in flight at once (BDPT's
    # 36-pair connection sweep at 800^2 = 640k rays crashed the worker)
    npix = w * h
    strip = cfg.ray_batch
    nstrips = -(-npix // strip)
    pad = nstrips * strip - npix
    base_p = jnp.concatenate([base, jnp.zeros((pad, 2), jnp.float32)])

    def sample(acc, k):
        k1, k2 = jax.random.split(k)
        jitter = jax.random.uniform(k1, base_p.shape)
        sp = (base_p + jitter) * inv

        def one_strip(args):
            sp_s, ks = args
            o, d = camera.get_rays(sp_s)
            return trace_rays(scene, o, d, ks, cfg)

        if nstrips == 1:
            li = one_strip((sp, k2))
        else:
            li = jax.lax.map(
                one_strip,
                (
                    sp.reshape(nstrips, strip, 2),
                    jax.random.split(k2, nstrips),
                ),
            ).reshape(nstrips * strip, 3)
        return acc + li[: w * h], None

    acc0 = jnp.zeros((w * h, 3), jnp.float32)
    keys = jax.random.split(key, cfg.samples_per_pixel)
    acc, _ = jax.lax.scan(sample, acc0, keys)
    img = acc / cfg.samples_per_pixel
    return img.reshape(h, w, 3)


def accumulate(scene: Scene, camera: Camera, cfg: RenderConfig, key, acc, n):
    """Progressive accumulation (``accumulate_naive``, ``rendering.h:74-125``):
    adds one sample per pixel into `acc`; estimate = acc / n."""
    one = RenderConfig(**{**cfg.__dict__, "samples_per_pixel": 1})
    img = render(scene, camera, one, key)
    return acc + img, n + 1


def render_image(scene: Scene, camera: Camera, cfg: RenderConfig, key) -> jnp.ndarray:
    """Jitted render returning a gamma-less float image in [0, inf)."""
    return jax.jit(render, static_argnums=(2,))(scene, camera, cfg, key)
