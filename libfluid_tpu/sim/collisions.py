"""Particle/solid collision response.

Reference ``_detect_collisions`` (``simulation.cpp:612-683``) marches a 3D DDA
(``grid.h:140-209``) from each particle's pre-advection position to its new
position, stops at the first solid cell, and then applies a per-axis
"skin-width" push-out from adjacent solid cells / domain walls.

TPU version: the data-dependent DDA becomes a fixed number of samples along
the motion segment (``cfg.collision_substeps``) — the particle is pulled back
to the last sample before the first solid sample. With CFL-bounded motion
(<= cfl_number cells per substep) and >=1-cell-thick obstacles the sampled
march detects the same collisions; the skin push-out is an exact port and
handles resting contact against floors/walls.
"""

from __future__ import annotations

import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import CellType, SimConfig


def _solid_at(solid_ct: jnp.ndarray, idx3: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """Solid lookup with out-of-bounds = solid (``mac_grid.cpp:30``)."""
    dims = jnp.asarray(cfg.grid_size, jnp.int32)
    inb = jnp.all((idx3 >= 0) & (idx3 < dims), axis=-1)
    c = jnp.clip(idx3, 0, dims - 1)
    return jnp.where(inb, solid_ct[c[..., 0], c[..., 1], c[..., 2]], True)


def resolve_collisions(
    old_position: jnp.ndarray,
    position: jnp.ndarray,
    solid: jnp.ndarray,
    cfg: SimConfig,
) -> jnp.ndarray:
    """Pull particles out of solid cells they moved into, then apply the
    boundary skin. `solid` is the (nx,ny,nz) bool mask."""
    s = cfg.collision_substeps
    h = cfg.cell_size
    skin = cfg.boundary_skin_width

    if not cfg.has_obstacles:
        # No interior solid cells: the segment march can never hit (advection
        # already clamps into the domain), and the skin push-out only engages
        # against the six domain walls — pure arithmetic, no grid lookups.
        # This is the common case (dam break, sphere drop, water wall) and
        # avoids ~30M scattered solid-grid reads per step at 2M particles.
        gpos = position - jnp.asarray(cfg.grid_offset, position.dtype)
        cell_idx = jnp.floor(gpos / h).astype(jnp.int32)
        dims = jnp.asarray(cfg.grid_size, jnp.int32)
        cell_idx = jnp.clip(cell_idx, 0, dims - 1)
        cell_pos = gpos - cell_idx.astype(position.dtype) * h
        cell_skin_max = h - skin
        neg_blocked = cell_idx == 0
        pos_blocked = cell_idx + 1 >= dims
        d = jnp.where((cell_pos < skin) & neg_blocked, skin - cell_pos, 0.0)
        d = d + jnp.where(
            (cell_pos > cell_skin_max) & pos_blocked, cell_skin_max - cell_pos, 0.0
        )
        return position + d

    # --- segment march: first solid sample wins ---
    ts = jnp.linspace(0.0, 1.0, s + 1, dtype=position.dtype)  # includes both ends
    # (N, s+1, 3) sample positions
    seg = old_position[:, None, :] + ts[None, :, None] * (
        position - old_position
    )[:, None, :]
    g = (seg - jnp.asarray(cfg.grid_offset, position.dtype)) / h
    idx = jnp.floor(g).astype(jnp.int32)
    in_solid = _solid_at(solid, idx, cfg)  # (N, s+1)
    any_hit = jnp.any(in_solid, axis=1)
    # index of first solid sample; pull back to the previous sample
    first_hit = jnp.argmax(in_solid, axis=1)
    safe = jnp.maximum(first_hit - 1, 0)
    t_safe = ts[safe]
    resolved = old_position + t_safe[:, None] * (position - old_position)
    pos = jnp.where(any_hit[:, None], resolved, position)

    # --- skin push-out from adjacent solid cells / domain walls ---
    # Exact port of simulation.cpp:652-681.
    gpos = pos - jnp.asarray(cfg.grid_offset, position.dtype)
    cell_idx = jnp.floor(gpos / h).astype(jnp.int32)
    dims = jnp.asarray(cfg.grid_size, jnp.int32)
    cell_idx = jnp.clip(cell_idx, 0, dims - 1)
    cell_pos = gpos - cell_idx.astype(position.dtype) * h
    cell_skin_max = h - skin

    deltas = []
    for dim in range(3):
        off = jnp.zeros((3,), jnp.int32).at[dim].set(1)
        cp = cell_pos[..., dim]
        neg_blocked = (cell_idx[..., dim] == 0) | _solid_at(solid, cell_idx - off, cfg)
        pos_blocked = (cell_idx[..., dim] + 1 >= dims[dim]) | _solid_at(
            solid, cell_idx + off, cfg
        )
        d = jnp.where((cp < skin) & neg_blocked, skin - cp, 0.0)
        d = d + jnp.where((cp > cell_skin_max) & pos_blocked, cell_skin_max - cp, 0.0)
        deltas.append(d)
    return pos + jnp.stack(deltas, axis=-1)
