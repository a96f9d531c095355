"""Particle/solid collision response — exact 3D-DDA march.

Reference ``_detect_collisions`` (``simulation.cpp:612-683``) marches a 3D DDA
(``grid::march_cells``, ``grid.h:140-209``) from each particle's
pre-advection position to its new position, stops at the first solid (or
out-of-bounds) cell, pulls the particle back a skin width before the hit
face and cancels the remaining motion along that axis; up to three rounds
(one per axis) re-march the shortened segment. A per-axis skin push-out from
adjacent solid cells / domain walls follows.

TPU formulation: the same DDA, vectorized over the particle wavefront as a
``lax.while_loop`` — every lane advances its own min-t axis each iteration
and lanes finish independently; the loop exits when all lanes are done (for
CFL-bounded motion that is a handful of iterations). This visits EVERY cell
on the segment, so 1-cell-thin walls cannot be tunneled through (the
round-1 fixed-sample march could skip over corners between samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from libfluid_tpu.config import SimConfig

_BIG = 3.0e38


def _solid_at(solid_ct: jnp.ndarray, idx3: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """Solid lookup with out-of-bounds = solid (``mac_grid.cpp:30``)."""
    dims = jnp.asarray(cfg.grid_size, jnp.int32)
    inb = jnp.all((idx3 >= 0) & (idx3 < dims), axis=-1)
    c = jnp.clip(idx3, 0, dims - 1)
    return jnp.where(inb, solid_ct[c[..., 0], c[..., 1], c[..., 2]], True)


def _march_round(from_w, to_w, need, solid, cfg: SimConfig, max_steps: int):
    """One ``march_cells`` sweep per particle (``grid.h:140-209``); on a hit,
    the reference's pull-back + axis cancellation (``simulation.cpp:637-643``).
    `need` masks which lanes march. Returns (from', to', hit)."""
    h = cfg.cell_size
    off = jnp.asarray(cfg.grid_offset, from_w.dtype)
    skin = cfg.boundary_skin_width

    f = (from_w - off) / h
    tt = (to_w - off) / h
    from_cell = jnp.floor(f).astype(jnp.int32)
    to_cell = jnp.floor(tt).astype(jnp.int32)
    diff = tt - f
    pos_dir = diff > 0.0
    advance = jnp.where(pos_dir, 1, -1).astype(jnp.int32)
    face_pos = jnp.where(pos_dir, 1.0, 0.0)
    inv_abs = jnp.where(jnp.abs(diff) > 1e-30, 1.0 / jnp.abs(diff), _BIG)
    t0 = jnp.abs(from_cell.astype(f.dtype) + face_pos - f) * inv_abs  # (N, 3)

    n = from_w.shape[0]
    active0 = need & jnp.any(from_cell != to_cell, axis=-1)

    def body(state):
        it, current, t, active, hit, hit_dim, hit_t = state
        # min-t axis per lane (grid.h:166-177)
        dim = jnp.argmin(t, axis=-1)
        mint = jnp.take_along_axis(t, dim[:, None], -1)[:, 0]
        # emergency break on float drift (grid.h:196-199)
        alive = active & (mint <= 1.0)
        onehot = jax.nn.one_hot(dim, 3, dtype=jnp.int32)
        cur2 = current + onehot * advance
        is_solid = _solid_at(solid, cur2, cfg)
        newly_hit = alive & is_solid
        hit = hit | newly_hit
        hit_dim = jnp.where(newly_hit, dim.astype(jnp.int32), hit_dim)
        hit_t = jnp.where(newly_hit, mint, hit_t)
        # continue marching: advance the crossed axis' t (grid.h:205)
        go = alive & ~is_solid
        current = jnp.where(go[:, None], cur2, current)
        t = jnp.where(
            go[:, None],
            t + onehot.astype(t.dtype) * jnp.take_along_axis(inv_abs, dim[:, None], -1),
            t,
        )
        done = jnp.all(current == to_cell, axis=-1)
        active = go & ~done
        return it + 1, current, t, active, hit, hit_dim, hit_t

    def cond(state):
        it, _, _, active = state[0], state[1], state[2], state[3]
        return (it < max_steps) & jnp.any(active)

    state = (
        jnp.int32(0),
        from_cell,
        t0,
        active0,
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), from_w.dtype),
    )
    _, _, _, _, hit, hit_dim, hit_t = jax.lax.while_loop(cond, body, state)

    # pull back a skin width before the hit face (simulation.cpp:637-641):
    # t += skin / dot(to - from, normal), normal = -advance[dim]
    offset_w = to_w - from_w
    off_dim = jnp.take_along_axis(offset_w, hit_dim[:, None], -1)[:, 0]
    adv_dim = jnp.take_along_axis(advance, hit_dim[:, None], -1)[:, 0].astype(
        from_w.dtype
    )
    denom = off_dim * (-adv_dim)  # = -|offset[dim]|
    t_new = jnp.maximum(
        hit_t + skin / jnp.where(jnp.abs(denom) > 1e-30, denom, -1e-30), 0.0
    )
    new_from = from_w + t_new[:, None] * offset_w
    # cancel the remaining motion along the hit axis (to[dim] = from[dim])
    axis_mask = jax.nn.one_hot(hit_dim, 3, dtype=from_w.dtype)
    new_to = to_w * (1.0 - axis_mask) + new_from * axis_mask

    from_w = jnp.where(hit[:, None], new_from, from_w)
    to_w = jnp.where(hit[:, None], new_to, to_w)
    return from_w, to_w, hit


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _march(old_position, position, solid, cfg: SimConfig):
    """Full collision march: up to one ``_march_round`` per axis
    (``simulation.cpp:618-650``: retry while ``into_wall``).

    Straight-through gradient: the march is a projection with a
    data-dependent while_loop (not reverse-differentiable) and piecewise-
    constant clipping whose true derivative is 0/1 flags; the cotangent
    passes through to `position` unchanged — the same estimator used for
    particle-domain clamping."""
    max_steps = int(3 * max(cfg.cfl_number, 1.0)) + 8
    from_w, to_w = old_position, position
    need = jnp.ones((position.shape[0],), bool)
    for _ in range(3):
        from_w, to_w, hit = _march_round(from_w, to_w, need, solid, cfg, max_steps)
        need = hit  # re-march only lanes that collided
    return to_w


def _march_fwd(old_position, position, solid, cfg):
    return _march(old_position, position, solid, cfg), None


def _march_bwd(cfg, _, g):
    return jnp.zeros_like(g), g, None


_march.defvjp(_march_fwd, _march_bwd)


def resolve_collisions(
    old_position: jnp.ndarray,
    position: jnp.ndarray,
    solid: jnp.ndarray,
    cfg: SimConfig,
) -> jnp.ndarray:
    """Pull particles out of solid cells they moved into, then apply the
    boundary skin. `solid` is the (nx,ny,nz) bool mask."""
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

    # --- exact DDA march, up to one round per axis (simulation.cpp:618-650) ---
    pos = _march(old_position, position, solid, cfg)

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
