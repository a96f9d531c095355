"""Pallas-kernel vs jnp-oracle parity — REAL TPU only.

The CPU suite exercises the jnp oracles; these tests compare the fused
Pallas kernels against them on actual hardware and are skipped elsewhere.
Run directly on the chip:

    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest \
        tests/test_tpu_kernels.py -q -p no:cacheprovider --noconftest

(the project conftest pins the CPU backend; --noconftest keeps the TPU.)
Compiles take minutes per kernel under the remote Mosaic pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="requires a real TPU backend"
    ),
]


def _slot_payload(cfg, kc, key, with_vel=True):
    nx, ny, nz = cfg.grid_size
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cellpos = jax.random.uniform(k1, (3, kc, nx, ny, nz))
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, kc, nx, ny, nz), 2)
    iy = jax.lax.broadcasted_iota(jnp.float32, (1, kc, nx, ny, nz), 3)
    iz = jax.lax.broadcasted_iota(jnp.float32, (1, kc, nx, ny, nz), 4)
    base = jnp.concatenate([ix, iy, iz], 0)
    pos = (base + cellpos) * cfg.cell_size + jnp.asarray(
        cfg.grid_offset
    ).reshape(3, 1, 1, 1, 1)
    mask = (jax.random.uniform(k2, (1, kc, nx, ny, nz)) < 0.35).astype(
        jnp.float32
    )[0]
    if not with_vel:
        return pos * mask, mask
    vel = jax.random.normal(k3, (3, kc, nx, ny, nz))
    aff = jax.random.normal(k4, (9, kc, nx, ny, nz)) * 0.2
    data = jnp.concatenate([pos, mask[None], vel, aff], 0) * mask[None]
    return data


def test_p2g_kernel_parity():
    from libfluid_tpu.config import SimConfig, TransferScheme
    from libfluid_tpu.sim import transfers

    for scheme in (TransferScheme.APIC, TransferScheme.PIC):
        cfg = SimConfig(
            grid_size=(16, 16, 128), cell_size=0.7,
            grid_offset=(0.3, -0.2, 0.1), scheme=scheme,
            particle_capacity=1 << 14,
        )
        data = _slot_payload(cfg, cfg.max_neighbors_per_cell, jax.random.PRNGKey(3))
        jn, jd = jax.jit(lambda d: transfers._p2g_slots_jnp(d, cfg))(data)
        pn, pd = jax.jit(lambda d: transfers._p2g_data(d, cfg))(data)
        for a in range(3):
            jo = np.asarray(transfers._normalize(jn[a], jd[a]))
            po = np.asarray(transfers._normalize(pn[a], pd[a]))
            err = np.max(np.abs(jo - po)) / (np.max(np.abs(jo)) + 1e-9)
            assert err < 2e-5, (scheme, a, err)


def test_correction_kernel_parity():
    from libfluid_tpu.config import SimConfig
    from libfluid_tpu.sim import correction, kernels

    cfg = SimConfig(
        grid_size=(16, 16, 128), cell_size=0.8, grid_offset=(0.1, 0.2, -0.3),
        particle_capacity=1 << 14,
    )
    kc = 8
    pos, mask = _slot_payload(cfg, kc, jax.random.PRNGKey(7), with_vel=False)
    re2 = cfg.cell_size**2 / 2.0
    # jitter ON on both paths: the deterministic counter-based hash
    # (jitterhash) makes the Pallas kernel and the jnp oracle evaluate the
    # SAME coincident-pair jitter, so parity now covers it too
    want = np.asarray(
        jax.jit(
            lambda p, m: correction._springs_jnp(
                p, m, re2, jnp.int32(12345), cfg
            )
        )(pos, mask)
    )
    got = np.asarray(
        jax.jit(
            lambda p, m: kernels.correction_springs_pallas(
                p, m, re2, jnp.int32(12345), cfg
            )
        )(pos, mask)
    )
    # springs = pos*wsum - wnbr cancels catastrophically; the attainable
    # agreement is one ulp of the |pos|*wsum intermediate, so normalize by
    # that scale rather than the residual spring magnitude
    scale = float(np.max(np.abs(np.asarray(pos)))) * 100.0
    err = np.max(np.abs(want - got)) / scale
    assert err < 2e-6, err


def test_mesher_surface_kernel_parity():
    from libfluid_tpu.config import MesherConfig
    from libfluid_tpu.mesher import surface

    cfg = MesherConfig(
        grid_size=(24, 20, 28), cell_size=0.5, grid_offset=(-1.0, -0.5, 0.2),
        particle_extent=2.0, particle_radius=0.5,
    )
    key = jax.random.PRNGKey(0)
    n = 5000
    pos = jax.random.uniform(key, (n, 3), minval=0.5, maxval=8.0)
    active = jnp.arange(n) % 5 != 0
    oracle = np.asarray(
        jax.jit(lambda p, a: surface._sample_surface_jnp(p, a, cfg, 0.5))(pos, active)
    )
    fast = np.asarray(
        jax.jit(lambda p, a: surface._sample_surface_tpu(p, a, cfg, 0.5))(pos, active)
    )
    assert np.max(np.abs(oracle - fast)) < 2e-3


def test_slotsort_expand_kernel_parity():
    """Pallas monotone-expand vs its gather oracle (slotsort._expand_jnp) on
    a real sorted particle set (VERDICT r3 next #9: the expand kernel is in
    the production path but had no on-chip parity run)."""
    from libfluid_tpu.config import SimConfig, TransferScheme
    from libfluid_tpu.sim import new_state, seed_box, slotsort

    cfg = SimConfig(
        grid_size=(16, 16, 8), particle_capacity=1 << 12,
        scheme=TransferScheme.APIC, has_obstacles=False,
    )
    assert slotsort.pallas_ok(cfg), "pick a grid the kernel supports"
    state = new_state(cfg, jax.random.PRNGKey(5))
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (9.0, 9.0, 5.0))

    block = slotsort._pick_block(cfg.num_cells)
    rs = jax.jit(
        lambda s: slotsort.sort_rank_major(s, cfg, pad_cols=block + 2 * slotsort.PAD)
    )(state)
    flat_p = jax.jit(
        lambda r: slotsort.expand_range(r, cfg, jnp.int32(0), cfg.num_cells, block)
    )(rs)

    # oracle on the same inputs (force the jnp path)
    k = cfg.max_neighbors_per_cell
    kr = rs.ins.reshape(k, cfg.num_cells)
    # rebuild delta/w0 exactly as expand_range does, then run the oracle
    import libfluid_tpu.sim.slotsort as ss
    orig = ss._expand_impl
    outs = {}
    try:
        def jnp_only(payT, delta, w0, blk):
            return ss._expand_jnp(payT, delta, w0, blk)

        ss._expand_impl = jnp_only
        flat_j = jax.jit(
            lambda r: slotsort.expand_range(r, cfg, jnp.int32(0), cfg.num_cells, block)
        )(rs)
    finally:
        ss._expand_impl = orig

    a, b = np.asarray(flat_p), np.asarray(flat_j)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_g2p_major_layout_parity():
    """(18, N)-layout G2P weight eval + Pallas row transpose vs the minor
    path, on chip."""
    from libfluid_tpu import grids
    from libfluid_tpu.config import SimConfig, TransferScheme
    from libfluid_tpu.sim import new_state, seed_box, transfers

    cfg = SimConfig(
        grid_size=(16, 16, 32), particle_capacity=1 << 13,
        scheme=TransferScheme.APIC, has_obstacles=False,
    )
    state = new_state(cfg, jax.random.PRNGKey(6))
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (8.0, 8.0, 11.0))
    key = jax.random.PRNGKey(7)
    grid = state.grid._replace(
        u=jax.random.normal(key, state.grid.u.shape),
        v=jax.random.normal(jax.random.fold_in(key, 1), state.grid.v.shape),
        w=jax.random.normal(jax.random.fold_in(key, 2), state.grid.w.shape),
    )
    tbl = jax.jit(lambda g: transfers.build_g2p_table(g, cfg))(grid)
    cell3c = jnp.clip(
        grids.cell_index_of(state.position, cfg), 0,
        jnp.asarray(cfg.grid_size, jnp.int32) - 1,
    )
    sT = jax.jit(transfers._transpose_rows)(tbl[grids.flat_cell_index(cell3c, cfg)])
    v1, a1 = jax.jit(
        lambda sT, p, c: transfers._g2p_weights_major(sT, p, c, cfg)
    )(sT, state.position, cell3c)

    old = transfers._G2P_MAJOR_LAYOUT
    try:
        transfers._G2P_MAJOR_LAYOUT = False
        v0, a0 = jax.jit(
            lambda t, p: transfers.g2p_from_table(t, p, cfg)
        )(tbl, state.position)
    finally:
        transfers._G2P_MAJOR_LAYOUT = old
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-5, atol=1e-5)


def test_multigrid_stencil_parity():
    """The fused x-plane stencil (apply / damped-Jacobi / residual) vs the
    jnp slice algebra it replaces (VERDICT r4 missing #3: the r4 kernel
    shipped with no parity test anywhere)."""
    from libfluid_tpu.config import CellType
    from libfluid_tpu.sim import multigrid

    key = jax.random.PRNGKey(11)
    shape = (16, 16, 128)
    kt, kx, kb = jax.random.split(key, 3)
    u = jax.random.uniform(kt, shape)
    ct = jnp.where(
        u < 0.45, jnp.int8(CellType.FLUID),
        jnp.where(u < 0.6, jnp.int8(CellType.SOLID), jnp.int8(CellType.AIR)),
    )
    level = multigrid._operator_from_types(ct, 0.25, jnp.float32)
    x = jax.random.normal(kx, shape) * level.fluid
    b = jax.random.normal(kb, shape) * level.fluid

    # jnp oracles (the _stencil_ok gate is False at this size, so the public
    # functions run the slice path)
    assert not multigrid._stencil_ok(level)
    want_apply = np.asarray(jax.jit(multigrid.apply_level)(level, x))
    want_resid = np.asarray(jax.jit(multigrid.residual)(level, x, b))
    want_smooth = np.asarray(
        jax.jit(lambda l, x, b: multigrid._smooth(l, x, b, 1))(level, x, b)
    )

    got_apply = np.asarray(
        jax.jit(lambda l, x, b: multigrid._stencil_pass(l, x, b, mode=0))(
            level, x, b
        )
    )
    got_resid = np.asarray(
        jax.jit(
            lambda l, x, b: multigrid._stencil_pass(l, x, b, mode=2)
            * l.fluid
        )(level, x, b)
    )
    got_smooth = np.asarray(
        jax.jit(
            lambda l, x, b: multigrid._stencil_pass(
                l, x, b, mode=1, damp=multigrid._SMOOTH_DAMP
            )
            * l.fluid
        )(level, x, b)
    )
    np.testing.assert_allclose(got_apply, want_apply, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(got_resid, want_resid, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(got_smooth, want_smooth, rtol=1e-6, atol=1e-5)
