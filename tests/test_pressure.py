"""Pressure projection tests: operator correctness vs a dense NumPy oracle,
CG convergence, divergence-free projection, and the custom-VJP adjoint."""

import jax
import jax.numpy as jnp
import numpy as np

from libfluid_tpu import grids
from libfluid_tpu.config import CellType, SimConfig
from libfluid_tpu.sim import pressure


def _setup(seed=0, n=8):
    """Random scene: solid floor, fluid blob in the lower half, air above."""
    rng = np.random.default_rng(seed)
    cfg = SimConfig(grid_size=(n, n, n), cell_size=0.5, particle_capacity=8)
    ct = np.full((n, n, n), CellType.AIR, np.int8)
    ct[:, 0, :] = CellType.SOLID  # floor
    ct[n // 2, n // 2, n // 2] = CellType.SOLID  # interior obstacle cell
    fluid = rng.uniform(size=(n, n, n)) < 0.5
    fluid[:, n // 2:, :] = False
    fluid &= ct == CellType.AIR
    ct[fluid] = CellType.FLUID
    grid = grids.zeros(cfg)._replace(
        u=jnp.asarray(rng.normal(size=(n + 1, n, n)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(n, n + 1, n)), jnp.float32),
        w=jnp.asarray(rng.normal(size=(n, n, n + 1)), jnp.float32),
        cell_type=jnp.asarray(ct),
    )
    return cfg, grid


def _dense_A(ct, a_scale):
    """Dense oracle of the masked 7-point Laplacian (pressure_solver.cpp:160-178,
    334-362), built cell by cell in NumPy."""
    n = ct.shape[0]
    idx = {tuple(c): i for i, c in enumerate(np.argwhere(ct == CellType.FLUID))}
    m = len(idx)
    A = np.zeros((m, m))
    for (x, y, z), i in idx.items():
        diag = 0
        for d in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
            nb = (x + d[0], y + d[1], z + d[2])
            inb = all(0 <= nb[k] < n for k in range(3))
            t = ct[nb] if inb else CellType.SOLID
            if t != CellType.SOLID:
                diag += 1
            if inb and t == CellType.FLUID:
                A[i, idx[nb]] = -1.0
        A[i, i] = diag
    return A * a_scale, idx


def test_apply_A_matches_dense_oracle():
    cfg, grid = _setup()
    ct = np.asarray(grid.cell_type)
    a_scale = 0.37
    A, idx = _dense_A(ct, a_scale)
    rng = np.random.default_rng(1)
    p_dense = rng.normal(size=len(idx))
    p_grid = np.zeros(ct.shape, np.float32)
    for c, i in idx.items():
        p_grid[c] = p_dense[i]
    op = pressure.build_operator(grid.cell_type)
    out = np.asarray(pressure.apply_A(op, jnp.asarray(p_grid), a_scale))
    expect = A @ p_dense
    got = np.array([out[c] for c in idx])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_rhs_matches_dense_oracle():
    """b from compute_rhs == the reference's per-cell divergence with
    solid-face velocity replacement (pressure_solver.cpp:180-242)."""
    cfg, grid = _setup()
    ct = np.asarray(grid.cell_type)
    u, v, w = np.asarray(grid.u), np.asarray(grid.v), np.asarray(grid.w)
    n = ct.shape[0]

    def solid(c):
        return (not all(0 <= c[k] < n for k in range(3))) or ct[c] == CellType.SOLID

    b = np.asarray(pressure.compute_rhs(grid, cfg))
    for c in np.argwhere(ct == CellType.FLUID)[:50]:
        x, y, z = map(int, c)
        ulo = 0.0 if solid((x - 1, y, z)) else u[x, y, z]
        uhi = 0.0 if solid((x + 1, y, z)) else u[x + 1, y, z]
        vlo = 0.0 if solid((x, y - 1, z)) else v[x, y, z]
        vhi = 0.0 if solid((x, y + 1, z)) else v[x, y + 1, z]
        wlo = 0.0 if solid((x, y, z - 1)) else w[x, y, z]
        whi = 0.0 if solid((x, y, z + 1)) else w[x, y, z + 1]
        expect = -((uhi - ulo) + (vhi - vlo) + (whi - wlo)) / cfg.cell_size
        np.testing.assert_allclose(b[x, y, z], expect, rtol=1e-5, atol=1e-5)


def test_cg_matches_dense_solve():
    cfg, grid = _setup()
    dt = 0.01
    a_scale = dt / (cfg.density * cfg.cell_size**2)
    res = pressure.solve(grid, cfg, dt)
    ct = np.asarray(grid.cell_type)
    A, idx = _dense_A(ct, a_scale)
    b = np.asarray(pressure.compute_rhs(grid, cfg))
    b_dense = np.array([b[c] for c in idx])
    p_dense = np.linalg.solve(A, b_dense)
    got = np.array([np.asarray(res.pressure)[c] for c in idx])
    np.testing.assert_allclose(got, p_dense, rtol=1e-3, atol=1e-3)
    assert float(res.residual) < cfg.solver.tolerance


def test_projection_makes_fluid_divergence_free():
    cfg, grid = _setup(seed=3)
    dt = 0.02
    res = pressure.solve(grid, cfg, dt)
    grid2 = pressure.apply_pressure(grid, res.pressure, cfg, dt)
    # the post-projection solid-face-corrected divergence on fluid cells is
    # exactly the next solve's RHS; it must be ~0
    b_after = np.asarray(pressure.compute_rhs(grid2, cfg))
    assert np.abs(b_after).max() < 5e-4


def test_pressure_vjp_is_adjoint_solve():
    cfg, grid = _setup(seed=4)
    dt = 0.015
    a_scale = dt / (cfg.density * cfg.cell_size**2)
    from libfluid_tpu.sim import multigrid

    levels = multigrid.build_levels(grid.cell_type)
    op = pressure.build_operator(grid.cell_type)
    b0 = pressure.compute_rhs(grid, cfg)

    def scalar(b):
        res = pressure.solve_pressure_system(
            levels, b, a_scale, jnp.zeros_like(b), cfg.solver.tolerance,
            cfg.solver.max_iterations, cfg.solver.preconditioner,
        )
        return jnp.sum(res.pressure**2)

    g = jax.grad(scalar)(b0)
    # finite-difference check along a random fluid-supported direction
    rng = np.random.default_rng(5)
    probe = rng.normal(size=b0.shape).astype(np.float32) * np.asarray(op.fluid)
    probe = jnp.asarray(probe)
    eps = 1e-2
    fd = (scalar(b0 + eps * probe) - scalar(b0 - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, probe)), float(fd), rtol=3e-2)


def test_trivial_rhs_early_out():
    cfg, grid = _setup(seed=6)
    grid = grid._replace(
        u=jnp.zeros_like(grid.u), v=jnp.zeros_like(grid.v), w=jnp.zeros_like(grid.w)
    )
    res = pressure.solve(grid, cfg, 0.01)
    assert int(res.iterations) == 0
    assert np.allclose(np.asarray(res.pressure), 0.0)
