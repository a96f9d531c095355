"""slotsort: the fused sort + monotone-expand slot-grid build.

Checks (1) the expand oracle/algorithm property on adversarial random cases,
(2) equivalence of ``sort_and_build`` with the reference path
(``binning.sort_by_cell`` + ``slots.build``) up to particle permutation, and
(3) the custom VJP against the jnp oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import binning as binning_mod
from libfluid_tpu.sim import slots as slots_mod
from libfluid_tpu.sim import slotsort
from libfluid_tpu.sim.state import new_state, seed_box


def _rand_state(cfg, seed=0, frac=0.7):
    rng = np.random.default_rng(seed)
    n = cfg.particle_capacity
    lo = np.asarray(cfg.domain_min) + 0.05
    hi = np.asarray(cfg.domain_max) - 0.05
    st = new_state(cfg, jax.random.PRNGKey(seed))
    pos = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    # cluster half the particles to force slot overflow in some cells
    m = n // 2
    centers = rng.uniform(lo, hi, size=(8, 3))
    pos[:m] = centers[rng.integers(0, 8, m)] + rng.normal(0, 0.3, (m, 3))
    pos = np.clip(pos, lo, hi).astype(np.float32)
    active = rng.uniform(size=n) < frac
    return st._replace(
        position=jnp.asarray(pos),
        velocity=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        affine=jnp.asarray(rng.standard_normal((n, 3, 3)).astype(np.float32)),
        active=jnp.asarray(active),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sort_and_build_matches_reference_path(seed):
    cfg = SimConfig(
        grid_size=(12, 10, 14),
        particle_capacity=4096,
        scheme=TransferScheme.APIC,
        has_obstacles=False,
    )
    st = _rand_state(cfg, seed)
    res = slotsort.sort_and_build(st, cfg)

    st2, bins2 = binning_mod.sort_by_cell(st, cfg)
    sg2 = slots_mod.build(st2.position, st2.velocity, st2.affine, bins2, cfg)

    # occupancy and overflow totals agree
    np.testing.assert_array_equal(
        np.asarray(res.bins.occupancy), np.asarray(bins2.occupancy)
    )
    assert int(jnp.sum(res.slot_grid.overflow)) == int(jnp.sum(sg2.overflow))
    assert int(res.n_overflow) == int(jnp.sum(sg2.overflow))
    assert int(res.n_kept) + int(res.n_overflow) == int(jnp.sum(st.active))

    # the slot grids hold the same multiset of particles per cell: compare
    # per-cell sorted payload rows (slot order within a cell is arbitrary)
    k = cfg.max_neighbors_per_cell
    a = np.asarray(res.slot_grid.data).reshape(16, k, -1)
    b = np.asarray(sg2.data).reshape(16, k, -1)
    a = np.sort(a, axis=1)
    b = np.sort(b, axis=1)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)

    # slot_of round-trips: reading the grid back gives each particle's payload
    got = slots_mod.gather_per_particle(res.slot_grid.position, res.slot_grid)
    kept = np.asarray(res.slot_grid.slot_of) < k * cfg.num_cells
    np.testing.assert_allclose(
        np.asarray(got)[kept], np.asarray(res.state.position)[kept]
    )

    # overflow rows are contiguous right after the kept block
    ov = np.asarray(res.slot_grid.overflow)
    nk, nov = int(res.n_kept), int(res.n_overflow)
    assert ov[:nk].sum() == 0 and ov[nk:nk + nov].all() and ov[nk + nov:].sum() == 0


def test_expand_property_random():
    # adversarial small cases straight against the gather oracle
    rng = np.random.default_rng(3)
    for _ in range(50):
        C = int(rng.integers(2, 40))
        K = int(rng.integers(1, 6))
        counts = rng.poisson(1.2, C).astype(np.int64)
        cnt = np.minimum(counts, K)
        kr = (cnt[None, :] > np.arange(K)[:, None]).reshape(-1)
        ins = np.cumsum(kr) - kr
        j = np.arange(C * K)
        delta = (j - ins).astype(np.int32)
        delta = np.where(kr, delta, delta | slotsort.INV).astype(np.int32)
        nk = int(kr.sum())
        payT = rng.standard_normal((16, nk + C * K + 2 * slotsort.PAD)).astype(
            np.float32
        )
        payT[:, nk:] = 0.0
        out = slotsort._expand(
            jnp.asarray(payT), jnp.asarray(delta),
            jnp.zeros((1,), jnp.int32), C * K,
        )
        ref = slotsort._expand_jnp(jnp.asarray(payT), jnp.asarray(delta), jnp.zeros((1,), jnp.int32), C * K)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_expand_vjp_matches_oracle():
    rng = np.random.default_rng(4)
    C, K = 16, 3
    counts = rng.poisson(1.5, C)
    cnt = np.minimum(counts, K)
    kr = (cnt[None, :] > np.arange(K)[:, None]).reshape(-1)
    ins = np.cumsum(kr) - kr
    j = np.arange(C * K)
    delta = np.where(kr, j - ins, (j - ins) | slotsort.INV).astype(np.int32)
    nk = int(kr.sum())
    payT = rng.standard_normal((16, nk + C * K + 2 * slotsort.PAD)).astype(np.float32)
    w0 = jnp.zeros((1,), jnp.int32)

    f = lambda p: jnp.sum(
        jnp.sin(slotsort._expand(p, jnp.asarray(delta), w0, C * K))
    )
    g_custom = jax.grad(f)(jnp.asarray(payT))
    f_ref = lambda p: jnp.sum(jnp.sin(slotsort._expand_jnp(p, jnp.asarray(delta), w0, C * K)))
    g_ref = jax.grad(f_ref)(jnp.asarray(payT))
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), atol=1e-6)


def test_substep_runs_with_slotsort():
    cfg = SimConfig(
        grid_size=(16, 16, 16),
        particle_capacity=8192,
        scheme=TransferScheme.APIC,
        gravity=(0.0, -981.0, 0.0),
        has_obstacles=False,
    )
    from libfluid_tpu.sim import substep

    st = new_state(cfg, jax.random.PRNGKey(0))
    st = seed_box(st, cfg, (1.0, 1.0, 1.0), (7.0, 7.0, 7.0))
    st2, diag = jax.jit(lambda s: substep(s, cfg, 0.01))(st)
    assert int(diag.particle_count) == int(jnp.sum(st.active))
    assert np.isfinite(float(diag.kinetic_energy))
    assert np.isfinite(np.asarray(st2.position)).all()
