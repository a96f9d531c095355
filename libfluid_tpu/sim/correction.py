"""Anti-clumping position correction.

Reference ``_correct_positions`` (``simulation.cpp:562-610``), after
"Preserving Fluid Sheets with Adaptively Sampled Anisotropic Particles":
every particle accumulates a repulsive spring from neighbors within the 3x3x3
cell neighborhood with kernel (1 - d^2/re^2)^3, re = h/sqrt(2), and moves by
spring * dt * stiffness * re, clamped back into the domain (no skin).

The reference's OpenMP loop + per-thread PCG RNG becomes a fixed-capacity
neighbor gather (see :mod:`libfluid_tpu.sim.binning`) and a counter-based
``jax.random`` jitter for near-coincident pairs — deterministic and
reproducible across shardings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libfluid_tpu.config import SimConfig
from libfluid_tpu.sim import binning as binning_mod


CHUNK = 1 << 16  # particles per gather chunk; bounds the (chunk, 27*K) blowup
# so 128^3-scale scenes (millions of particles) fit in HBM


def correct_positions(
    position: jnp.ndarray,
    active: jnp.ndarray,
    bins: binning_mod.Binning,
    cfg: SimConfig,
    dt,
    key,
) -> jnp.ndarray:
    re = cfg.cell_size / jnp.sqrt(2.0).astype(cfg.dtype)
    n = position.shape[0]

    def spring_of(args):
        pos_chunk, key_chunk, base = args
        ids, valid = binning_mod.gather_neighbors(bins, pos_chunk, cfg)
        # exclude self-pairs
        self_id = base + jnp.arange(pos_chunk.shape[0], dtype=ids.dtype)
        valid = valid & (ids != self_id[:, None])

        nbr_pos = position[ids]  # (C, M, 3)
        offset = pos_chunk[:, None, :] - nbr_pos
        sq = jnp.sum(offset * offset, axis=-1)
        degenerate = sq < 1e-12

        kernel_lower = 1.0 - sq / (re * re)
        kernel = jnp.where(kernel_lower > 0.0, kernel_lower ** 3, 0.0)
        inv_dist = jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
        spring_terms = (kernel * inv_dist)[..., None] * offset

        # near-coincident pairs contribute a uniform random force in [-1,1]^3
        # (ref simulation.cpp:585-589)
        jitter = jax.random.uniform(
            key_chunk, spring_terms.shape, cfg.dtype, minval=-1.0, maxval=1.0
        )
        spring_terms = jnp.where(degenerate[..., None], jitter, spring_terms)
        spring_terms = jnp.where(valid[..., None], spring_terms, 0.0)
        return jnp.sum(spring_terms, axis=1)

    if n <= CHUNK:
        spring = spring_of((position, key, jnp.int32(0)))
    else:
        nchunk = (n + CHUNK - 1) // CHUNK
        pad = nchunk * CHUNK - n
        pos_p = jnp.pad(position, ((0, pad), (0, 0))).reshape(nchunk, CHUNK, 3)
        keys = jax.random.split(key, nchunk)
        bases = jnp.arange(nchunk, dtype=jnp.int32) * CHUNK
        spring = jax.lax.map(spring_of, (pos_p, keys, bases)).reshape(-1, 3)[:n]

    new_pos = position + spring * (dt * cfg.correction_stiffness * re)
    lo = jnp.asarray(cfg.domain_min, cfg.dtype)
    hi = jnp.asarray(cfg.domain_max, cfg.dtype)
    new_pos = jnp.clip(new_pos, lo, hi)
    return jnp.where(active[:, None], new_pos, position)
