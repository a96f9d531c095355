"""Pressure Poisson projection: matrix-free preconditioned CG on the dense grid.

Replaces the reference's ``pressure_solver`` (``pressure_solver.h/.cpp``).
Differences by design, not accident:

- The reference compacts fluid cells into a vector and stores the 7-point
  Laplacian as per-cell bitfields (``pressure_solver.h:17-26``); here the
  system lives on the dense (nx,ny,nz) grid with masks — every operator
  application is a fused stencil over static-shape arrays, which XLA tiles
  onto the VPU and which shards over a device mesh with width-1 halos.
- The reference's MIC(0) preconditioner (``pressure_solver.cpp:244-332``) is
  two *sequential* triangular sweeps — inherently order-dependent and
  unshardable. It is replaced by the order-free diagonal (Jacobi)
  preconditioner; iteration counts are higher for the same tolerance but every
  iteration is a parallel stencil + two all-reducible dot products.
- The solve carries a ``jax.custom_vjp``: because A is symmetric, the adjoint
  of p = A^{-1} b is b_bar = A^{-1} p_bar — one extra CG solve in the backward
  pass (implicit function theorem), instead of differentiating through the
  iteration.

Matrix and RHS semantics match ``pressure_solver.cpp`` exactly:
- A over fluid cells: diag = #non-solid neighbors (out-of-bounds counts
  solid), off-diag -1 between fluid neighbors, all scaled by
  a_scale = dt / (density * h^2) (``pressure_solver.cpp:22,160-178,334-362``).
- b = -(1/h) * divergence computed with faces adjacent to solid cells
  replaced by the solid velocity (0) (``pressure_solver.cpp:180-242``).
- apply_pressure updates every face adjacent to >=1 fluid cell:
  faces against solid are set to 0, otherwise u -= dt/(rho*h) * (pR - pL)
  with p = 0 in air (``pressure_solver.cpp:73-148``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import CellType, SimConfig
from libfluid_tpu.sim import multigrid


class PoissonOperator(NamedTuple):
    """Masks defining the masked 7-point Laplacian. All float arrays so the
    pytree is uniformly differentiable (cotangents are zero)."""

    fluid: jnp.ndarray  # (nx,ny,nz) 1.0 where fluid
    couple_u: jnp.ndarray  # (nx+1,ny,nz) 1.0 where the x-face joins two fluid cells
    couple_v: jnp.ndarray  # (nx,ny+1,nz)
    couple_w: jnp.ndarray  # (nx,ny,nz+1)
    diag: jnp.ndarray  # (nx,ny,nz) #non-solid neighbors, on fluid cells


def _pad_solid(solid: jnp.ndarray) -> jnp.ndarray:
    """Pad the solid mask by one cell of solid on every side (out-of-bounds
    cells are solid, ``mac_grid.cpp:30``)."""
    return jnp.pad(solid, 1, constant_values=True)


def build_operator(cell_type: jnp.ndarray, dtype=jnp.float32) -> PoissonOperator:
    fluid_b = cell_type == CellType.FLUID
    solid_b = cell_type == CellType.SOLID
    sp = _pad_solid(solid_b)
    c = sp[1:-1, 1:-1, 1:-1]

    nonsolid_count = (
        (~sp[:-2, 1:-1, 1:-1]).astype(dtype)
        + (~sp[2:, 1:-1, 1:-1]).astype(dtype)
        + (~sp[1:-1, :-2, 1:-1]).astype(dtype)
        + (~sp[1:-1, 2:, 1:-1]).astype(dtype)
        + (~sp[1:-1, 1:-1, :-2]).astype(dtype)
        + (~sp[1:-1, 1:-1, 2:]).astype(dtype)
    )
    del c

    fp = jnp.pad(fluid_b, 1, constant_values=False)
    couple_u = (fp[:-1, 1:-1, 1:-1] & fp[1:, 1:-1, 1:-1]).astype(dtype)
    couple_v = (fp[1:-1, :-1, 1:-1] & fp[1:-1, 1:, 1:-1]).astype(dtype)
    couple_w = (fp[1:-1, 1:-1, :-1] & fp[1:-1, 1:-1, 1:]).astype(dtype)

    fluid = fluid_b.astype(dtype)
    return PoissonOperator(
        fluid=fluid,
        couple_u=couple_u,
        couple_v=couple_v,
        couple_w=couple_w,
        diag=nonsolid_count * fluid,
    )


def apply_A(op: PoissonOperator, p: jnp.ndarray, a_scale) -> jnp.ndarray:
    """y = A p on the dense grid (zero outside fluid). One fused stencil."""
    p = p * op.fluid
    nbr = (
        op.couple_u[:-1] * jnp.pad(p, ((1, 0), (0, 0), (0, 0)))[:-1]
        + op.couple_u[1:] * jnp.pad(p, ((0, 1), (0, 0), (0, 0)))[1:]
        + op.couple_v[:, :-1] * jnp.pad(p, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        + op.couple_v[:, 1:] * jnp.pad(p, ((0, 0), (0, 1), (0, 0)))[:, 1:]
        + op.couple_w[:, :, :-1] * jnp.pad(p, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        + op.couple_w[:, :, 1:] * jnp.pad(p, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
    )
    return a_scale * (op.diag * p - nbr) * op.fluid


def open_face_masks(cell_type: jnp.ndarray, dtype=jnp.float32):
    """1.0 on faces whose two adjacent cells (out-of-bounds = solid) are both
    non-solid."""
    solid_b = cell_type == CellType.SOLID
    sp = _pad_solid(solid_b)
    open_u = (~sp[:-1, 1:-1, 1:-1] & ~sp[1:, 1:-1, 1:-1]).astype(dtype)
    open_v = (~sp[1:-1, :-1, 1:-1] & ~sp[1:-1, 1:, 1:-1]).astype(dtype)
    open_w = (~sp[1:-1, 1:-1, :-1] & ~sp[1:-1, 1:-1, 1:]).astype(dtype)
    return open_u, open_v, open_w


def compute_rhs(grid: grids.MacGrid, cfg: SimConfig) -> jnp.ndarray:
    """b = -(1/h) div(u_eff), u_eff = face velocities with solid-adjacent faces
    read as the solid velocity (0). Matches ``_compute_b_vector``."""
    open_u, open_v, open_w = open_face_masks(grid.cell_type, cfg.dtype)
    ue = grid.u * open_u
    ve = grid.v * open_v
    we = grid.w * open_w
    div = (
        (ue[1:] - ue[:-1]) + (ve[:, 1:] - ve[:, :-1]) + (we[:, :, 1:] - we[:, :, :-1])
    )
    fluid = (grid.cell_type == CellType.FLUID).astype(cfg.dtype)
    return -div / cfg.cell_size * fluid


class PressureResult(NamedTuple):
    pressure: jnp.ndarray  # (nx,ny,nz); zero outside fluid
    residual: jnp.ndarray  # max |r| at exit
    iterations: jnp.ndarray  # int32


def _cg(levels, b: jnp.ndarray, a_scale, tol, max_iters, precond, x0=None) -> PressureResult:
    """Preconditioned CG, matrix-free, fixed upper iteration bound.

    Mirrors the loop structure of ``pressure_solver::solve``
    (``pressure_solver.cpp:19-71``) with the serial MIC(0) preconditioner
    replaced by an order-free one: a geometric multigrid V-cycle
    (:mod:`libfluid_tpu.sim.multigrid`) by default, diagonal as fallback.
    The early-out on tiny ||b||^2 (< 1e-6, ``pressure_solver.cpp:33-35``) is
    folded into the loop condition.

    A = a_scale * A1 where A1 is the unit-scale finest-level operator, so
    M^-1 = V(A1) / a_scale keeps the preconditioner consistent.
    """
    lvl0 = levels[0]

    if precond == "mg16":
        # bfloat16 copy of the hierarchy for the preconditioner sweeps; the
        # outer CG iteration (apply_A1, dots, updates) stays in b's dtype
        levels16 = tuple(
            multigrid.MGLevel(
                *[f.astype(jnp.bfloat16) for f in lev[:-1]], lev.scale
            )
            for lev in levels
        )

    def apply_M(r):
        if precond == "mg16":
            return (
                multigrid.v_cycle(levels16, r.astype(jnp.bfloat16)).astype(
                    r.dtype
                )
                / a_scale
            )
        if precond == "mg":
            return multigrid.v_cycle(levels, r) / a_scale
        return lvl0.inv_diag / a_scale * r

    def apply_A1(p):
        return multigrid.apply_level(lvl0, p) * a_scale

    b2 = jnp.sum(b * b)
    nontrivial = b2 >= 1e-6
    if x0 is None:
        p0 = jnp.zeros_like(b)
        r0 = b
    else:
        # warm start from the previous substep's pressure: same solution to
        # tolerance, fewer iterations (the flow field changes slowly per
        # CFL-bounded substep). Gated on `nontrivial`: when the early-out
        # skips the loop the result must be the zero pressure of the cold
        # start (``pressure_solver.cpp:33-35``), not the stale x0.
        p0 = jnp.where(nontrivial, x0 * lvl0.fluid, 0.0)
        r0 = b - apply_A1(p0)
    z0 = apply_M(r0)
    s0 = z0
    sigma0 = jnp.sum(z0 * r0)
    res0 = jnp.max(jnp.abs(r0))

    def cond(carry):
        _, _, _, _, res, it = carry
        return nontrivial & (res >= tol) & (it < max_iters)

    def body(carry):
        p, r, s, sigma, _, it = carry
        z = apply_A1(s)
        denom = jnp.sum(z * s)
        alpha = sigma / jnp.where(denom != 0.0, denom, 1.0)
        p = p + alpha * s
        r = r - alpha * z
        res = jnp.max(jnp.abs(r))
        z = apply_M(r)
        sigma_new = jnp.sum(z * r)
        beta = sigma_new / jnp.where(sigma != 0.0, sigma, 1.0)
        s = z + beta * s
        return p, r, s, sigma_new, res, it + 1

    p, r, _, _, res, iters = jax.lax.while_loop(
        cond, body, (p0, r0, s0, sigma0, jnp.where(nontrivial, res0, 0.0), jnp.int32(0))
    )
    return PressureResult(pressure=p * lvl0.fluid, residual=res, iterations=iters)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def solve_pressure_system(levels, b: jnp.ndarray, a_scale, x0, tol, max_iters, precond):
    """p = A^{-1} b (restricted to fluid cells), differentiable w.r.t. b.

    Because A is symmetric, the adjoint of the solve is the same solve
    (implicit function theorem): b_bar = A^{-1} p_bar — one extra CG in the
    backward pass instead of differentiating the iteration. The operator
    masks and a_scale are constants of the solve (zero cotangents): gradients
    flow through b, a differentiable function of the face velocities. `x0`
    (warm start) affects only the iteration count, so its cotangent is zero
    and the backward solve starts cold.
    """
    return _cg(levels, b, a_scale, tol, max_iters, precond, x0=x0)


def _solve_fwd(levels, b, a_scale, x0, tol, max_iters, precond):
    res = _cg(levels, b, a_scale, tol, max_iters, precond, x0=x0)
    return res, (levels, a_scale)


def _solve_bwd(tol, max_iters, precond, saved, cotangent):
    levels, a_scale = saved
    g = cotangent.pressure  # cotangents of residual/iterations are discarded
    lam = _cg(levels, g * levels[0].fluid, a_scale, tol, max_iters, precond).pressure
    zero_levels = jax.tree_util.tree_map(jnp.zeros_like, levels)
    return (
        zero_levels,
        lam,
        jnp.zeros_like(jnp.asarray(a_scale)),
        jnp.zeros_like(levels[0].fluid),
    )


solve_pressure_system.defvjp(_solve_fwd, _solve_bwd)


def _precond_tag(cfg: SimConfig) -> str:
    """Static preconditioner tag: "mg"/"jacobi", "mg16" for the bf16 cycle."""
    p = cfg.solver.preconditioner
    if p == "mg" and cfg.solver.preconditioner_dtype == "bfloat16":
        return "mg16"
    return p


def solve(grid: grids.MacGrid, cfg: SimConfig, dt, x0=None) -> PressureResult:
    """Assemble and solve the pressure system for the current grid state."""
    levels = multigrid.build_levels(grid.cell_type, cfg.dtype)
    a_scale = dt / (cfg.density * cfg.cell_size * cfg.cell_size)
    b = compute_rhs(grid, cfg)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return solve_pressure_system(
        levels,
        b,
        a_scale,
        x0,
        cfg.solver.tolerance,
        cfg.solver.max_iterations,
        _precond_tag(cfg),
    )


def apply_pressure(grid: grids.MacGrid, pressure: jnp.ndarray, cfg: SimConfig, dt) -> grids.MacGrid:
    """Subtract the pressure gradient from face velocities.

    Only faces adjacent to at least one fluid cell are touched; touched faces
    against solid cells are set to the solid velocity (0). Matches
    ``pressure_solver::apply_pressure`` (``pressure_solver.cpp:73-148``).
    """
    coeff = dt / (cfg.density * cfg.cell_size)
    ct = grid.cell_type
    fluid_b = ct == CellType.FLUID
    fp = jnp.pad(fluid_b, 1, constant_values=False)
    pp = jnp.pad(pressure * fluid_b.astype(pressure.dtype), 1)
    open_u, open_v, open_w = open_face_masks(ct, cfg.dtype)

    def update(face_vel, axis):
        # L/R cell values along `axis` for every face of that axis.
        if axis == 0:
            p_l, p_r = pp[:-1, 1:-1, 1:-1], pp[1:, 1:-1, 1:-1]
            f_l, f_r = fp[:-1, 1:-1, 1:-1], fp[1:, 1:-1, 1:-1]
            open_m = open_u
        elif axis == 1:
            p_l, p_r = pp[1:-1, :-1, 1:-1], pp[1:-1, 1:, 1:-1]
            f_l, f_r = fp[1:-1, :-1, 1:-1], fp[1:-1, 1:, 1:-1]
            open_m = open_v
        else:
            p_l, p_r = pp[1:-1, 1:-1, :-1], pp[1:-1, 1:-1, 1:]
            f_l, f_r = fp[1:-1, 1:-1, :-1], fp[1:-1, 1:-1, 1:]
            open_m = open_w
        touched = f_l | f_r
        updated = face_vel - coeff * (p_r - p_l)
        # Open faces get the gradient update, closed (solid-adjacent) faces
        # of fluid cells are pinned to the solid velocity (0).
        new_vel = jnp.where(open_m > 0, updated, 0.0)
        return jnp.where(touched, new_vel, face_vel)

    return grid._replace(
        u=update(grid.u, 0), v=update(grid.v, 1), w=update(grid.w, 2)
    )
