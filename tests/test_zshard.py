"""Equivalence of the explicit shard_map z-sharded substep vs the dense path.

The particle ORDER differs (each device sorts locally), so particle outputs
are compared as multisets via lexicographic sort; grid arrays compare
directly. VERDICT r2 item 1: the sharded program must be the *same physics*
as the dense substep, communicated explicitly."""

import pytest

pytestmark = pytest.mark.slow  # 8-device CPU-mesh compiles

import jax
import jax.numpy as jnp
import numpy as np

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.parallel import make_mesh
from libfluid_tpu.parallel.zshard import step_z, substep_z, zshard_state
from libfluid_tpu.sim import new_state, seed_box, substep


def _mk(scheme=TransferScheme.APIC, nz=32):
    cfg = SimConfig(
        grid_size=(16, 16, nz),
        gravity=(0.0, -981.0, 0.0),
        particle_capacity=1 << 13,
        scheme=scheme,
        has_obstacles=False,
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (7.0, 7.0, nz / 2 - 1.0))
    return cfg, state


def _sorted_particles(state):
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    act = np.asarray(state.active)
    pos, vel = pos[act], vel[act]
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return pos[order], vel[order]


@pytest.mark.parametrize("scheme", [TransferScheme.APIC, TransferScheme.PIC])
def test_zshard_substep_matches_dense(scheme):
    cfg, state = _mk(scheme)
    mesh = make_mesh(8)
    dt = 1.0 / 60.0

    ref_state, ref_diag = jax.jit(lambda s: substep(s, cfg, dt))(state)

    zs = zshard_state(state, cfg, mesh)
    out_state, out_diag = jax.jit(lambda s: substep_z(s, cfg, dt, mesh))(zs)

    rp, rv = _sorted_particles(ref_state)
    op, ov = _sorted_particles(out_state)
    assert rp.shape == op.shape
    np.testing.assert_allclose(op, rp, atol=2e-4)
    np.testing.assert_allclose(ov, rv, atol=5e-3)

    np.testing.assert_allclose(
        np.asarray(out_state.grid.u), np.asarray(ref_state.grid.u), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_state.grid.v), np.asarray(ref_state.grid.v), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_state.grid.w), np.asarray(ref_state.grid.w), atol=5e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out_state.grid.cell_type), np.asarray(ref_state.grid.cell_type)
    )
    assert int(out_diag.particle_count) == int(ref_diag.particle_count)
    assert (
        abs(int(out_diag.pressure_iterations) - int(ref_diag.pressure_iterations))
        <= 2
    )
    assert float(out_diag.max_divergence) < 1e-3


def test_zshard_multi_substep_exchange():
    """Run several substeps with bulk +z motion so particles cross slab
    boundaries (the ppermute exchange actually fires); nothing may be lost
    and the trajectory must track the dense run in aggregate. (Bitwise
    per-particle tracking over many substeps is not expected: a dam break is
    chaotic, and 1e-4 reduction-order differences flip discrete cell
    assignments within a few steps.)"""
    cfg, state = _mk(TransferScheme.APIC)
    state = state._replace(
        velocity=jnp.where(
            state.active[:, None],
            jnp.asarray([0.0, 0.0, 60.0], jnp.float32),
            state.velocity,
        )
    )
    mesh = make_mesh(8)
    dt = 1.0 / 60.0
    nzl = cfg.nz // 8

    ref = state
    f_ref = jax.jit(lambda s: substep(s, cfg, dt)[0])
    for _ in range(4):
        ref = f_ref(ref)

    zs = zshard_state(state, cfg, mesh)
    owner0 = np.asarray(zs.position[:, 2] // nzl)[np.asarray(zs.active)]
    f_z = jax.jit(lambda s: substep_z(s, cfg, dt, mesh))
    for _ in range(4):
        zs, diag = f_z(zs)

    # crossings happened: ownership distribution changed
    owner1 = np.asarray(zs.position[:, 2] // nzl)[np.asarray(zs.active)]
    assert not np.array_equal(np.bincount(owner0.astype(int), minlength=8),
                              np.bincount(owner1.astype(int), minlength=8))
    # nothing lost, nothing out of bounds
    assert int(diag.particle_count) == int(np.asarray(ref.active).sum())
    op, ov = _sorted_particles(zs)
    rp, rv = _sorted_particles(ref)
    assert np.isfinite(op).all() and np.isfinite(ov).all()
    assert op.min() >= 0.0 and op.max() <= 32.0
    # aggregate trajectory tracking: center of mass and energy
    np.testing.assert_allclose(op.mean(axis=0), rp.mean(axis=0), atol=1e-2)
    ke_z, ke_r = 0.5 * (ov**2).sum(), 0.5 * (rv**2).sum()
    assert abs(ke_z - ke_r) / max(ke_r, 1.0) < 0.05


def test_step_z_cfl_driver():
    cfg, state = _mk(TransferScheme.APIC)
    mesh = make_mesh(8)
    zs = zshard_state(state, cfg, mesh)
    out, diag = jax.jit(lambda s: step_z(s, cfg, 1.0 / 60.0, mesh))(zs)
    assert int(diag.substeps) >= 1
    assert bool(jnp.isfinite(out.position).all())
    assert int(diag.particle_count) == int(np.asarray(state.active).sum())
