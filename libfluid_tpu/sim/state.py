"""Simulation state pytree and particle seeding.

The reference's particle struct (``simulation.h:24-42``: position, velocity,
APIC cx/cy/cz, old_position, raw_cell_index) becomes SoA arrays of a fixed
capacity with an ``active`` mask — XLA needs static shapes, so the dynamic
``std::vector<particle>`` is replaced by capacity planning + masking.
Seeding helpers mirror ``simulation::seed_box/seed_sphere/seed_func/seed_cell``
(``simulation.cpp:136-181``); they run host-side at setup time (sources that
seed *during* the simulation are handled in-jit by
:mod:`libfluid_tpu.sim.sources`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import CellType, SimConfig


class SourceSet(NamedTuple):
    """Flattened fluid sources (reference ``source.h:12-21``).

    All sources' cells are concatenated; per-cell records carry the owning
    source's parameters. Zero-length arrays mean "no sources".
    """

    cells: jnp.ndarray  # (S, 3) int32 cell indices
    velocity: jnp.ndarray  # (S, 3) seed velocity
    active: jnp.ndarray  # (S,) bool
    coerce_velocity: jnp.ndarray  # (S,) bool (ref source.h:20)
    target_density: jnp.ndarray  # (S,) int32 cube root of particles per cell


def empty_sources() -> SourceSet:
    return SourceSet(
        cells=jnp.zeros((0, 3), jnp.int32),
        velocity=jnp.zeros((0, 3), jnp.float32),
        active=jnp.zeros((0,), bool),
        coerce_velocity=jnp.zeros((0,), bool),
        target_density=jnp.zeros((0,), jnp.int32),
    )


class SimState(NamedTuple):
    """The complete simulation state: advances via ``step(state, cfg) -> state``."""

    position: jnp.ndarray  # (N, 3)
    velocity: jnp.ndarray  # (N, 3)
    affine: jnp.ndarray  # (N, 3, 3) APIC C matrix; rows are the reference's cx/cy/cz
    active: jnp.ndarray  # (N,) bool — slot in use
    grid: grids.MacGrid  # face velocities + cell types from the last step
    solid: jnp.ndarray  # (nx, ny, nz) bool — static solid geometry (walls/obstacles)
    sources: SourceSet
    key: jnp.ndarray  # jax.random key
    time: jnp.ndarray  # scalar accumulated sim time
    pressure: jnp.ndarray  # (nx, ny, nz) last substep's pressure — CG warm
    # start (the reference starts from zero every step, pressure_solver.cpp:30;
    # warm-starting changes only the iteration count, not the solution)


def new_state(cfg: SimConfig, key) -> SimState:
    n = cfg.particle_capacity
    dt = cfg.dtype
    grid = grids.zeros(cfg)
    return SimState(
        position=jnp.zeros((n, 3), dt),
        velocity=jnp.zeros((n, 3), dt),
        affine=jnp.zeros((n, 3, 3), dt),
        active=jnp.zeros((n,), bool),
        grid=grid,
        solid=jnp.zeros(cfg.grid_size, bool),
        sources=empty_sources(),
        key=key,
        time=jnp.zeros((), dt),
        pressure=jnp.zeros(cfg.grid_size, dt),
    )


def particle_count(state: SimState) -> jnp.ndarray:
    return jnp.sum(state.active.astype(jnp.int32))


def set_solid(state: SimState, solid_mask) -> SimState:
    """Install a solid-cell mask and mark those cells in the grid."""
    solid = jnp.asarray(solid_mask, bool)
    ct = jnp.where(solid, jnp.int8(CellType.SOLID), state.grid.cell_type)
    ct = jnp.where(
        ~solid & (state.grid.cell_type == CellType.SOLID), jnp.int8(CellType.AIR), ct
    )
    return state._replace(solid=solid, grid=state.grid._replace(cell_type=ct))


# ---------------------------------------------------------------------------
# Host-side seeding (setup time; mirrors simulation.cpp:136-181)
# ---------------------------------------------------------------------------


def _insert_particles(state: SimState, pos: np.ndarray, vel: np.ndarray) -> SimState:
    """Place host-generated particles into free slots of the SoA arrays."""
    if pos.shape[0] == 0:
        return state
    active = np.asarray(state.active).copy()
    free = np.flatnonzero(~active)
    if pos.shape[0] > free.size:
        raise ValueError(
            f"particle capacity exceeded: need {pos.shape[0]} free slots, have {free.size}"
        )
    slots = free[: pos.shape[0]]
    position = np.asarray(state.position).copy()
    velocity = np.asarray(state.velocity).copy()
    affine = np.asarray(state.affine).copy()
    position[slots] = pos
    velocity[slots] = vel
    affine[slots] = 0.0
    active[slots] = True
    return state._replace(
        position=jnp.asarray(position),
        velocity=jnp.asarray(velocity),
        affine=jnp.asarray(affine),
        active=jnp.asarray(active),
    )


def seed_func(
    state: SimState,
    cfg: SimConfig,
    start_cell: Tuple[int, int, int],
    cell_count: Tuple[int, int, int],
    predicate: Callable[[np.ndarray], np.ndarray],
    velocity=(0.0, 0.0, 0.0),
    density: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> SimState:
    """Seed `density`^3 particles per cell in a cell range, filtered by a
    world-space predicate over positions (reference ``simulation.h:94-115``)."""
    density = cfg.seeding_density if density is None else density
    rng = np.random.default_rng(0) if rng is None else rng
    h = cfg.cell_size
    off = np.asarray(cfg.grid_offset)
    sx, sy, sz = start_cell
    cx, cy, cz = cell_count
    gx, gy, gz = cfg.grid_size
    xs = np.arange(max(sx, 0), min(sx + cx, gx))
    ys = np.arange(max(sy, 0), min(sy + cy, gy))
    zs = np.arange(max(sz, 0), min(sz + cz, gz))
    if xs.size == 0 or ys.size == 0 or zs.size == 0:
        return state
    cells = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    per_cell = density ** 3
    jitter = rng.uniform(0.0, h, size=(cells.shape[0], per_cell, 3))
    pos = off + cells[:, None, :] * h + jitter
    pos = pos.reshape(-1, 3)
    keep = np.asarray(predicate(pos), bool)
    pos = pos[keep]
    vel = np.broadcast_to(np.asarray(velocity, np.float64), pos.shape).copy()
    return _insert_particles(state, pos, vel)


def seed_box(
    state: SimState,
    cfg: SimConfig,
    start,
    size,
    velocity=(0.0, 0.0, 0.0),
    density: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> SimState:
    """Seed a world-space axis-aligned box (reference ``simulation.cpp:153-168``)."""
    start = np.asarray(start, np.float64)
    end = start + np.asarray(size, np.float64)
    off = np.asarray(cfg.grid_offset)
    start_cell = np.maximum(np.floor((start - off) / cfg.cell_size), 0).astype(int)
    end_cell = np.maximum(np.floor((end - off) / cfg.cell_size), 0).astype(int)
    return seed_func(
        state,
        cfg,
        tuple(start_cell),
        tuple(end_cell - start_cell + 1),
        lambda p: np.all((p > start) & (p < end), axis=-1),
        velocity,
        density,
        rng,
    )


def seed_sphere(
    state: SimState,
    cfg: SimConfig,
    center,
    radius: float,
    velocity=(0.0, 0.0, 0.0),
    density: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> SimState:
    """Seed a world-space sphere (reference ``simulation.cpp:169-181``)."""
    center = np.asarray(center, np.float64)
    off = np.asarray(cfg.grid_offset)
    start_cell = np.maximum(
        np.floor((center - radius - off) / cfg.cell_size), 0
    ).astype(int)
    end_cell = np.maximum(
        np.floor((center + radius - off) / cfg.cell_size), 0
    ).astype(int)
    return seed_func(
        state,
        cfg,
        tuple(start_cell),
        tuple(end_cell - start_cell + 1),
        lambda p: np.sum((p - center) ** 2, axis=-1) < radius * radius,
        velocity,
        density,
        rng,
    )
