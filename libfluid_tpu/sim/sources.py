"""In-jit fluid sources: per-step seeding and velocity coercion.

Reference ``_update_sources`` (``simulation.cpp:756-765``) seeds each active
source cell back up to its target density every step (``seed_cell``,
``simulation.cpp:136-152``), and ``_advect_particles`` overwrites the velocity
of particles inside coercing source cells (``simulation.cpp:227-238``).

Dynamic particle creation under ``jit`` uses fixed-capacity allocation: each
source cell proposes up to MAX_SEED_PER_CELL candidates, candidates are
accepted up to the cell's deficit, and accepted candidates are placed into
free SoA slots by rank-matching two cumulative sums (no host round-trip, no
dynamic shapes). If the particle array is full, excess candidates are dropped
silently — capacity planning is the caller's job.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig
from libfluid_tpu.sim.state import SimState, SourceSet

MAX_SEED_PER_CELL = 8  # = default seeding density 2^3 (ref simulation.h:54)


def coerce_velocities(state: SimState, cfg: SimConfig) -> SimState:
    """Set velocity (and zero the APIC matrix) of particles inside active
    coercing source cells."""
    src = state.sources
    if src.cells.shape[0] == 0:
        return state
    cell = grids.flat_cell_index(grids.cell_index_of(state.position, cfg), cfg)
    src_flat = grids.flat_cell_index(src.cells, cfg)
    coercing = src.active & src.coerce_velocity  # (S,)
    # per-particle: does its cell match any coercing source cell? (N, S) — S is tiny.
    match = (cell[:, None] == src_flat[None, :]) & coercing[None, :]
    any_match = jnp.any(match, axis=1) & state.active
    # velocity of the first matching source
    src_id = jnp.argmax(match, axis=1)
    vel = jnp.where(any_match[:, None], src.velocity[src_id], state.velocity)
    affine = jnp.where(any_match[:, None, None], 0.0, state.affine)
    return state._replace(velocity=vel, affine=affine)


def seed_sources(
    state: SimState, occupancy: jnp.ndarray, cfg: SimConfig
) -> SimState:
    """Top every active source cell back up to its target particle density."""
    src = state.sources
    s = src.cells.shape[0]
    if s == 0:
        return state

    key, sub = jax.random.split(state.key)
    counts = occupancy[src.cells[..., 0], src.cells[..., 1], src.cells[..., 2]]
    target = jnp.minimum(src.target_density ** 3, MAX_SEED_PER_CELL)
    deficit = jnp.where(src.active, jnp.maximum(target - counts, 0), 0)  # (S,)

    # Candidate particles: (S, MAX_SEED_PER_CELL) uniform in their cell.
    jitter = jax.random.uniform(
        sub, (s, MAX_SEED_PER_CELL, 3), cfg.dtype, 0.0, cfg.cell_size
    )
    cand_pos = (
        jnp.asarray(cfg.grid_offset, cfg.dtype)
        + src.cells[:, None, :].astype(cfg.dtype) * cfg.cell_size
        + jitter
    ).reshape(-1, 3)
    cand_vel = jnp.broadcast_to(
        src.velocity[:, None, :], (s, MAX_SEED_PER_CELL, 3)
    ).reshape(-1, 3)
    slot_in_cell = jnp.broadcast_to(
        jnp.arange(MAX_SEED_PER_CELL)[None, :], (s, MAX_SEED_PER_CELL)
    ).reshape(-1)
    accepted = slot_in_cell < jnp.repeat(deficit, MAX_SEED_PER_CELL)
    n_accepted = jnp.sum(accepted.astype(jnp.int32))

    # Rank-match accepted candidates to free slots.
    cand_rank = jnp.cumsum(accepted.astype(jnp.int32)) - 1  # rank among accepted
    n_cand = accepted.shape[0]
    # cand_by_rank[r] = candidate id with accepted-rank r
    scatter_idx = jnp.where(accepted, cand_rank, n_cand)
    cand_by_rank = (
        jnp.full((n_cand + 1,), 0, jnp.int32)
        .at[scatter_idx]
        .set(jnp.arange(n_cand, dtype=jnp.int32), mode="drop")
    )[:-1]

    free_rank = jnp.cumsum((~state.active).astype(jnp.int32)) - 1  # per-slot
    take = (~state.active) & (free_rank < n_accepted)
    cid = cand_by_rank[jnp.clip(free_rank, 0, n_cand - 1)]

    position = jnp.where(take[:, None], cand_pos[cid], state.position)
    velocity = jnp.where(take[:, None], cand_vel[cid], state.velocity)
    affine = jnp.where(take[:, None, None], 0.0, state.affine)
    active = state.active | take
    return state._replace(
        position=position, velocity=velocity, affine=affine, active=active, key=key
    )


def make_source_set(
    cells, velocity, active=True, coerce_velocity=False, target_density=2
) -> SourceSet:
    """Build a SourceSet from host data; `cells` is (S,3) int, `velocity`
    either (3,) shared or (S,3)."""
    import numpy as np

    cells = jnp.asarray(np.asarray(cells, np.int32).reshape(-1, 3))
    sshape = (cells.shape[0],)
    vel = np.asarray(velocity, np.float32)
    if vel.ndim == 1:
        vel = np.broadcast_to(vel, (cells.shape[0], 3))
    return SourceSet(
        cells=cells,
        velocity=jnp.asarray(vel),
        active=jnp.broadcast_to(jnp.asarray(active, bool), sshape),
        coerce_velocity=jnp.broadcast_to(jnp.asarray(coerce_velocity, bool), sshape),
        target_density=jnp.broadcast_to(jnp.asarray(target_density, jnp.int32), sshape),
    )
