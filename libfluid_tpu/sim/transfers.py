"""Particle<->grid transfers (P2G / G2P) for PIC, FLIP and APIC.

Replaces the reference's ``_transfer_to_grid*`` / ``_transfer_from_grid*``
(``simulation.cpp:293-560``). The reference gathers over each cell's 3x3x3
particle neighborhood per face; here each particle *scatters* its 8 trilinear
(hat-kernel, ``simulation.cpp:207-213``) contributions per face array with a
weight accumulator, and faces normalize by total weight — the identical
weighted average, expressed as batched scatter-adds that XLA lowers to sorted
segment reductions on TPU, and that are differentiable by construction
(scatter-add transposes to gather).

Weights are always computed in cell units. (The reference's APIC P2G evaluates
the kernel on *world* offsets, ``simulation.cpp:371-375`` — equivalent only
when cell_size == 1; the normalized form here is the intended one.)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.math.interp import grad_hat

_WEIGHT_EPS = 1e-6  # ref simulation.cpp:327 "magic number"

_OFFSETS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def _face_world_shift(cfg: SimConfig, axis: int) -> jnp.ndarray:
    """World offset of face (i,j,k) of `axis` from offset + h*(i,j,k)."""
    shift = [0.5, 0.5, 0.5]
    shift[axis] = 0.0
    return jnp.asarray(shift, cfg.dtype) * cfg.cell_size


def _p2g_axis(
    position: jnp.ndarray,
    value: jnp.ndarray,
    affine_row: jnp.ndarray | None,
    active: jnp.ndarray,
    cfg: SimConfig,
    axis: int,
) -> jnp.ndarray:
    """Scatter one velocity component to its face array; returns the
    weight-normalized face array."""
    nx, ny, nz = cfg.grid_size
    shape = [nx, ny, nz]
    shape[axis] += 1
    dims = jnp.asarray(shape, jnp.int32)

    coords = grids.face_index_coords(position, cfg, axis)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base

    num = jnp.zeros(tuple(shape), cfg.dtype).reshape(-1)
    den = jnp.zeros(tuple(shape), cfg.dtype).reshape(-1)
    world_base = (
        jnp.asarray(cfg.grid_offset, cfg.dtype)
        + _face_world_shift(cfg, axis)
    )

    for off in _OFFSETS:
        offv = jnp.asarray(off, jnp.int32)
        idx = base + offv
        w = jnp.prod(
            jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), axis=-1
        )
        inb = jnp.all((idx >= 0) & (idx < dims), axis=-1) & active
        w = jnp.where(inb, w, 0.0)
        if affine_row is not None:
            face_pos = world_base + idx.astype(cfg.dtype) * cfg.cell_size
            val = value + jnp.sum(affine_row * (face_pos - position), axis=-1)
        else:
            val = value
        flat = (idx[..., 0] * shape[1] + idx[..., 1]) * shape[2] + idx[..., 2]
        flat = jnp.clip(flat, 0, num.shape[0] - 1)
        num = num.at[flat].add(w * val)
        den = den.at[flat].add(w)

    face = jnp.where(den > _WEIGHT_EPS, num / jnp.maximum(den, _WEIGHT_EPS), 0.0)
    return face.reshape(tuple(shape))


def p2g(
    position: jnp.ndarray,
    velocity: jnp.ndarray,
    affine: jnp.ndarray,
    active: jnp.ndarray,
    cfg: SimConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Particle-to-grid transfer of momentum; returns (u, v, w) face arrays.

    For PIC/FLIP pass ``affine=None``-like zeros and the APIC term vanishes;
    for APIC the affine rows add the reference's ``dot(c, face - pos)`` term
    (``simulation.cpp:376-385``).
    """
    use_affine = cfg.scheme == TransferScheme.APIC
    out = []
    for axis in range(3):
        out.append(
            _p2g_axis(
                position,
                velocity[:, axis],
                affine[:, axis, :] if use_affine else None,
                active,
                cfg,
                axis,
            )
        )
    return tuple(out)


def _g2p_axis(
    arr: jnp.ndarray, position: jnp.ndarray, cfg: SimConfig, axis: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather one velocity component and its spatial gradient per particle.

    The gradient combination with :func:`grad_hat` reproduces the reference's
    APIC c-vectors (``_calculate_c_vector``, ``simulation.cpp:507-546``):
    c_axis = sum over the 8 staggered samples of grad_kernel * sample, i.e.
    the world-space gradient of the trilerped component.
    """
    coords = grids.face_index_coords(position, cfg, axis)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    dims = jnp.asarray(arr.shape, jnp.int32)

    val = jnp.zeros(position.shape[:-1], cfg.dtype)
    grad = jnp.zeros_like(position)
    for off in _OFFSETS:
        offv = jnp.asarray(off, jnp.int32)
        idx = base + offv
        inb = jnp.all((idx >= 0) & (idx < dims), axis=-1)
        cidx = jnp.clip(idx, 0, dims - 1)
        sample = jnp.where(inb, arr[cidx[..., 0], cidx[..., 1], cidx[..., 2]], 0.0)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), axis=-1)
        val = val + w * sample
        grad = grad + grad_hat(frac - offv.astype(cfg.dtype), cfg.cell_size) * sample[..., None]
    return val, grad


def g2p_pic(
    grid: grids.MacGrid, position: jnp.ndarray, cfg: SimConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PIC/APIC grid-to-particle: interpolated velocity and the APIC affine
    matrix (rows = gradients of each component). Reference
    ``simulation.cpp:447-560``."""
    vals = []
    rows = []
    for axis, arr in enumerate((grid.u, grid.v, grid.w)):
        val, grad = _g2p_axis(arr, position, cfg, axis)
        vals.append(val)
        rows.append(grad)
    return jnp.stack(vals, axis=-1), jnp.stack(rows, axis=-2)


def g2p_flip(
    new_grid: grids.MacGrid,
    old_grid: grids.MacGrid,
    position: jnp.ndarray,
    velocity: jnp.ndarray,
    cfg: SimConfig,
) -> jnp.ndarray:
    """FLIP blend: v_new_grid + blend * (v_particle - v_old_grid)
    (reference ``_transfer_from_grid_flip``, ``simulation.cpp:464-506``)."""
    v_new = grids.velocity_at(new_grid, position, cfg)
    v_old = grids.velocity_at(old_grid, position, cfg)
    return v_new + (velocity - v_old) * cfg.blending_factor
