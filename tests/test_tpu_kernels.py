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
    want = np.asarray(
        jax.jit(
            lambda p, m: correction._springs_jnp(
                p, m, re2, jax.random.PRNGKey(0), cfg
            )
        )(pos, mask)
    )
    got = np.asarray(
        jax.jit(
            lambda p, m: kernels.correction_springs_pallas(
                p, m, re2, jnp.int32(0), cfg, with_jitter=False
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
