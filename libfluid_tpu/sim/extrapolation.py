"""Velocity extrapolation from fluid cells into the surrounding air.

Reference ``_extrapolate_velocities`` (``simulation.cpp:685-754``): k sweeps of
breadth-first neighbor averaging. Invalid cells with at least one valid
6-neighbor average their valid neighbors' positive-face velocity vectors and
become valid — but each *component* dim is only written when the positive
neighbor in dim is valid and has the same cell type as this cell
(``simulation.cpp:738-748``). That gate is load-bearing: the posface of an air
cell in dim is the face shared with its positive neighbor, so an air->fluid
face holds a freshly *projected* velocity which must not be overwritten (it
would re-introduce divergence on the fluid cell). Air->air faces extrapolate
freely.

Expressed here as masked 6-point stencils over a cell-centered view of the
face arrays, iterated with a ``fori_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import CellType, SimConfig


def _neighbor_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 6 face-neighbor values, zero-padded, along the TRAILING 3
    axes (leading axes broadcast — components stay the major axis so the
    (ny, nz) tiles are full; a trailing component axis of 3 would lane-pad
    3 -> 128 on every temp)."""
    lead = x.ndim - 3
    pad = [(0, 0)] * lead + [(1, 1), (1, 1), (1, 1)]
    xp = jnp.pad(x, pad)
    e = (...,)

    def sl(a, b, c):
        return xp[e + (a, b, c)]

    m = slice(1, -1)
    return (
        sl(slice(None, -2), m, m)
        + sl(slice(2, None), m, m)
        + sl(m, slice(None, -2), m)
        + sl(m, slice(2, None), m)
        + sl(m, m, slice(None, -2))
        + sl(m, m, slice(2, None))
    )


def _shift_neg(x: jnp.ndarray, axis: int, fill):
    """x shifted by -1 along `axis` (value of the positive neighbor),
    padding with `fill`."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    return jnp.pad(x, pad, constant_values=fill)[
        tuple(slice(1, None) if a == axis else slice(None) for a in range(x.ndim))
    ]


def extrapolate(grid: grids.MacGrid, cfg: SimConfig) -> grids.MacGrid:
    iters = cfg.velocity_extrapolation_iterations
    if iters <= 0:
        return grid

    # Cell-centered positive-face view, COMPONENT-MAJOR: vel_pf[c,i,j,k] =
    # (u[i+1], v[j+1], w[k+1])[c] — the grid dims stay minor for full tiles.
    vel_pf = jnp.stack(
        [grid.u[1:, :, :], grid.v[:, 1:, :], grid.w[:, :, 1:]], axis=0
    )
    ct = grid.cell_type
    valid0 = (ct == CellType.FLUID).astype(cfg.dtype)

    def body(_, carry):
        vel, valid = carry
        nsum = _neighbor_sum(vel * valid[None])
        ncount = _neighbor_sum(valid)
        has = ncount > 0
        avg = nsum / jnp.maximum(ncount, 1.0)[None]
        newly = (valid == 0) & has
        # per-component gate: positive neighbor valid and of equal cell type
        # (out-of-bounds neighbor acts as solid+invalid -> never matches air)
        writes = []
        for dim in range(3):
            nb_valid = _shift_neg(valid, dim, 0.0) > 0
            nb_type = _shift_neg(ct, dim, jnp.int8(CellType.SOLID))
            writes.append(newly & nb_valid & (nb_type == ct))
        write = jnp.stack(writes, axis=0)
        vel = jnp.where(write, avg, vel)
        valid = jnp.where(newly, 1.0, valid)
        return vel, valid

    vel_pf, _ = jax.lax.fori_loop(0, iters, body, (vel_pf, valid0))

    u = grid.u.at[1:, :, :].set(vel_pf[0])
    v = grid.v.at[:, 1:, :].set(vel_pf[1])
    w = grid.w.at[:, :, 1:].set(vel_pf[2])
    return grid._replace(u=u, v=v, w=w)
