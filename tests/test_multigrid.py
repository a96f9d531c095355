"""Multigrid preconditioner tests: operator equivalence, V-cycle symmetry
(CG's requirement), and the iteration-count win over diagonal preconditioning."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from libfluid_tpu import grids
from libfluid_tpu.config import CellType, SimConfig, SolverConfig
from libfluid_tpu.sim import multigrid, pressure


def _scene(n=32, seed=0):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(
        grid_size=(n, n, n), cell_size=1.0, particle_capacity=8,
    )
    ct = np.full((n, n, n), CellType.AIR, np.int8)
    ct[:, 0, :] = CellType.SOLID
    # a blobby pool with a solid pillar
    fluid = rng.uniform(size=(n, n, n)) < 0.6
    fluid[:, n // 2:, :] = False
    ct[(ct == CellType.AIR) & fluid] = CellType.FLUID
    ct[n // 3: n // 3 + 2, :, n // 3: n // 3 + 2] = CellType.SOLID
    grid = grids.zeros(cfg)._replace(
        u=jnp.asarray(rng.normal(size=(n + 1, n, n)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(n, n + 1, n)), jnp.float32),
        w=jnp.asarray(rng.normal(size=(n, n, n + 1)), jnp.float32),
        cell_type=jnp.asarray(ct),
    )
    return cfg, grid


def test_apply_level_matches_apply_A():
    cfg, grid = _scene(16)
    op = pressure.build_operator(grid.cell_type)
    levels = multigrid.build_levels(grid.cell_type)
    p = jnp.asarray(np.random.default_rng(1).normal(size=cfg.grid_size), jnp.float32)
    a = pressure.apply_A(op, p, 0.37)
    b = multigrid.apply_level(levels[0], p) * 0.37
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vcycle_is_symmetric():
    """CG requires a symmetric preconditioner: <M r1, r2> == <r1, M r2>."""
    cfg, grid = _scene(16)
    levels = multigrid.build_levels(grid.cell_type)
    rng = np.random.default_rng(2)
    fluid = np.asarray(levels[0].fluid)
    r1 = jnp.asarray(rng.normal(size=cfg.grid_size).astype(np.float32) * fluid)
    r2 = jnp.asarray(rng.normal(size=cfg.grid_size).astype(np.float32) * fluid)
    m1 = multigrid.v_cycle(levels, r1)
    m2 = multigrid.v_cycle(levels, r2)
    lhs = float(jnp.vdot(m1, r2))
    rhs = float(jnp.vdot(r1, m2))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
    # positive definiteness on the fluid subspace
    assert float(jnp.vdot(m1, r1)) > 0
    assert float(jnp.vdot(m2, r2)) > 0


@pytest.mark.slow
def test_mg_converges_much_faster_than_jacobi():
    """Iteration counts: MG is ~mesh-independent; Jacobi grows with size.
    Use a deep full-width pool (the hard case — long-range pressure
    communication) where the gap is visible at 48^3."""
    n = 48
    cfg = SimConfig(grid_size=(n, n, n), cell_size=1.0, particle_capacity=8)
    ct = np.full((n, n, n), CellType.AIR, np.int8)
    ct[:, 0, :] = CellType.SOLID
    ct[:, 1 : n - 4, :] = CellType.FLUID
    rng = np.random.default_rng(3)
    grid = grids.zeros(cfg)._replace(
        u=jnp.asarray(rng.normal(size=(n + 1, n, n)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(n, n + 1, n)), jnp.float32),
        w=jnp.asarray(rng.normal(size=(n, n, n + 1)), jnp.float32),
        cell_type=jnp.asarray(ct),
    )
    dt = 0.02
    res_mg = pressure.solve(grid, cfg, dt)
    cfg_j = dataclasses.replace(
        cfg, solver=SolverConfig(preconditioner="jacobi", max_iterations=2000)
    )
    res_j = pressure.solve(grid, cfg_j, dt)
    assert float(res_mg.residual) < cfg.solver.tolerance
    assert float(res_j.residual) < cfg.solver.tolerance
    assert int(res_mg.iterations) < int(res_j.iterations)
    assert int(res_mg.iterations) <= 40  # mesh-independent-ish count
    # identical solutions
    np.testing.assert_allclose(
        np.asarray(res_mg.pressure), np.asarray(res_j.pressure), atol=2e-3
    )


def test_coarsen_types_rules():
    ct = np.full((4, 4, 4), CellType.AIR, np.int8)
    ct[0, 0, 0] = CellType.FLUID  # block (0,0,0): any fluid -> fluid
    ct[2:4, 0:2, 0:2] = CellType.SOLID  # block (1,0,0): all solid -> solid
    out = np.asarray(multigrid._coarsen_types(jnp.asarray(ct)))
    assert out[0, 0, 0] == CellType.FLUID
    assert out[1, 0, 0] == CellType.SOLID
    assert out[1, 1, 1] == CellType.AIR
