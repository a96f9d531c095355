"""End-to-end simulation tests: the dam-break scenario (testbed setup 0,
``testbed/main.cpp:137-139``) at small scale, checking the physical invariants
the reference's testbed prints per step (energy trend, divergence, CG
convergence, particles staying in bounds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-frame dam-break runs

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import (
    SimState,
    new_state,
    seed_box,
    step,
    substep,
)
from libfluid_tpu.sim import sources as sources_mod
from libfluid_tpu.sim.state import particle_count


def _dam_break(scheme=TransferScheme.APIC, n=12, correction=True):
    cfg = SimConfig(
        grid_size=(n, n, n),
        cell_size=1.0,
        grid_offset=(0.0, 0.0, 0.0),
        gravity=(0.0, -10.0, 0.0),
        particle_capacity=1 << 12,
        scheme=scheme,
        enable_position_correction=correction,
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    # a block of fluid in one corner, ~1/8 of the domain
    state = seed_box(state, cfg, (0.5, 0.5, 0.5), (n / 2.0, n / 2.0, n / 2.0))
    return cfg, state


@pytest.mark.parametrize("scheme", [TransferScheme.APIC, TransferScheme.PIC, TransferScheme.FLIP])
def test_dam_break_runs_and_stays_bounded(scheme):
    cfg, state = _dam_break(scheme)
    n0 = int(particle_count(state))
    assert n0 > 0

    stepper = jax.jit(lambda s: step(s, cfg, 0.05))
    for _ in range(6):
        state, diag = stepper(state)

    assert int(particle_count(state)) == n0  # no particles lost
    pos = np.asarray(state.position)[np.asarray(state.active)]
    lo, hi = np.asarray(cfg.domain_min), np.asarray(cfg.domain_max)
    assert np.all(pos >= lo - 1e-4) and np.all(pos <= hi + 1e-4)
    assert np.all(np.isfinite(np.asarray(state.velocity)))
    # pressure projection converged and killed the divergence
    assert float(diag.pressure_residual) < cfg.solver.tolerance * 10
    assert float(diag.max_divergence) < 1e-2
    assert float(diag.max_velocity) < 100.0


def test_fluid_settles_to_rest():
    """With gravity and no inflow, the dam-break loses energy (the reference's
    energy print is its de-facto regression check, testbed/main.cpp:54-59).
    PIC is strongly dissipative and must settle to near-rest; APIC (which the
    reference keeps lively via the correction springs) must stay bounded."""
    cfg, state = _dam_break(TransferScheme.PIC, n=10)
    stepper = jax.jit(lambda s: step(s, cfg, 0.05))
    total_hist, vmax_hist = [], []
    for _ in range(60):
        state, diag = stepper(state)
        total_hist.append(float(diag.kinetic_energy + diag.potential_energy))
        vmax_hist.append(float(diag.max_velocity))
    assert np.isfinite(vmax_hist).all()
    assert vmax_hist[-1] < 2.5  # near rest
    assert total_hist[-1] < total_hist[0] * 0.7  # energy decayed

    cfg, state = _dam_break(TransferScheme.APIC, n=10)
    stepper = jax.jit(lambda s: step(s, cfg, 0.05))
    for _ in range(40):
        state, diag = stepper(state)
    assert np.isfinite(float(diag.max_velocity))
    assert float(diag.max_velocity) < 30.0  # bounded churn, no blow-up


def test_solid_obstacle_excludes_particles():
    n = 12
    cfg = SimConfig(
        grid_size=(n, n, n),
        cell_size=1.0,
        gravity=(0.0, -10.0, 0.0),
        particle_capacity=1 << 12,
        scheme=TransferScheme.APIC,
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    # fluid block dropped above a 2-cell solid floor
    state = seed_box(state, cfg, (2.0, 4.0, 2.0), (5.0, 4.0, 5.0))
    solid = np.zeros(cfg.grid_size, bool)
    solid[:, :2, :] = True
    from libfluid_tpu.sim.state import set_solid

    state = set_solid(state, jnp.asarray(solid))
    stepper = jax.jit(lambda s: step(s, cfg, 0.05))
    for _ in range(20):
        state, diag = stepper(state)
    pos = np.asarray(state.position)[np.asarray(state.active)]
    # particles never penetrate the solid floor (2 cells) minus skin tolerance
    assert pos[:, 1].min() > 2.0 - 0.25


def test_source_seeds_particles():
    cfg = SimConfig(
        grid_size=(8, 8, 8),
        cell_size=1.0,
        gravity=(0.0, -10.0, 0.0),
        particle_capacity=1 << 10,
        scheme=TransferScheme.APIC,
    )
    state = new_state(cfg, jax.random.PRNGKey(1))
    src = sources_mod.make_source_set(
        cells=[[4, 6, 4]], velocity=[0.0, -2.0, 0.0], coerce_velocity=True
    )
    state = state._replace(sources=src)
    stepper = jax.jit(lambda s: substep(s, cfg, 0.05))
    counts = []
    for _ in range(5):
        state, _ = stepper(state)
        counts.append(int(particle_count(state)))
    assert counts[0] >= 8  # seeded immediately
    assert counts[-1] > counts[0]  # keeps emitting as particles fall away


def test_substep_is_jit_and_grad_safe():
    """The whole substep must be differentiable: gradient of a particle-state
    loss w.r.t. initial velocities flows through P2G -> pressure -> G2P."""
    cfg, state = _dam_break(TransferScheme.APIC, n=8)
    cfg = SimConfig(**{**cfg.__dict__, "enable_position_correction": False,
                       "particle_capacity": cfg.particle_capacity})

    def loss(vel0):
        st = state._replace(velocity=vel0)
        st, _ = substep(st, cfg, 0.05)
        act = st.active.astype(st.position.dtype)
        return jnp.sum(jnp.sum(st.position, -1) * act)

    g = jax.jit(jax.grad(loss))(state.velocity)
    gn = np.asarray(g)[np.asarray(state.active)]
    assert np.all(np.isfinite(gn))
    assert np.abs(gn).max() > 0.0


def test_dam_break_overflow_within_exact_capacity():
    """Dam-break transients DO exceed K particles/cell occasionally (measured
    ~1200/16384 at dam-break impact with K=12) — those overflow particles are
    merged exactly by p2g_slots' compacted scatter pass as long as their
    count stays under ``cfg.p2g_overflow_capacity``. Assert the margin
    holds."""
    import jax

    from libfluid_tpu.config import SimConfig, TransferScheme
    from libfluid_tpu.sim import new_state, seed_box, step

    cfg = SimConfig(
        grid_size=(24, 24, 24),
        gravity=(0.0, -981.0, 0.0),
        particle_capacity=1 << 14,
        scheme=TransferScheme.APIC,
        has_obstacles=False,
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (9.0, 9.0, 9.0))
    fn = jax.jit(lambda s: step(s, cfg, 1.0 / 60.0))
    cap = cfg.p2g_overflow_capacity
    worst = 0
    for _ in range(30):
        state, diag = fn(state)
        worst = max(worst, int(diag.overflow_count))
    # measured worst: ~1.2k/16384 (7%) at K=12 impact; demand 2x headroom
    assert worst < cap // 2, f"overflow {worst} too close to capacity {cap}"
