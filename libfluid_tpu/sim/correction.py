"""Anti-clumping position correction.

Reference ``_correct_positions`` (``simulation.cpp:562-610``), after
"Preserving Fluid Sheets with Adaptively Sampled Anisotropic Particles":
every particle accumulates a repulsive spring from neighbors within the 3x3x3
cell neighborhood with kernel (1 - d^2/re^2)^3, re = h/sqrt(2), and moves by
spring * dt * stiffness * re, clamped back into the domain (no skin).

TPU formulation: the neighbor structure is densified once per step into
*cell slot blocks* — a (occupied_cells, K, 3) array of resident positions
built by one scatter from the cell-sorted order. Each particle then reads its
27 neighbor cells as 27 *contiguous* (K, 3) blocks (block gathers, not
per-element gathers — ~K times fewer gather descriptors, which is what
dominates XLA gather cost on TPU), and the springs reduce over a dense
(27*K) axis on the VPU. Cells holding more than K particles contribute only
their first K in sorted order (fixed-capacity truncation; rare at the default
8-per-cell seeding). The reference's per-thread RNG for coincident pairs
becomes a counter-based ``jax.random`` jitter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig
from libfluid_tpu.sim import binning as binning_mod

CHUNK = 1 << 17  # particles per pairwise chunk; bounds the (chunk, 27K) blowup

_NEIGHBOR_OFFSETS = [
    (dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
]


class CellSlots(NamedTuple):
    """Dense per-occupied-cell particle blocks."""

    positions: jnp.ndarray  # (C+1, K, 3); row C is the all-invalid sink
    mask: jnp.ndarray  # (C+1, K) bool
    ids: jnp.ndarray  # (C+1, K) int32 particle ids (for self-exclusion)
    row_of_cell: jnp.ndarray  # (num_cells,) int32 -> row or C (sink)


def max_occupied_cells(cfg: SimConfig) -> int:
    """Static capacity for occupied-cell compaction: the 8-per-cell default
    seeding gives ~N/8 occupied cells; allow 2x headroom. Cells compacted past
    the capacity (extremely dispersed particle sets) silently receive no
    correction springs — graceful degradation, not corruption."""
    return min(cfg.num_cells, max(cfg.particle_capacity // 4, 4096))


def build_cell_slots(
    position: jnp.ndarray, bins: binning_mod.Binning, cfg: SimConfig
) -> CellSlots:
    k = cfg.max_neighbors_per_cell
    num_cells = cfg.num_cells
    c_cap = max_occupied_cells(cfg)
    n = position.shape[0]

    occupied = bins.cell_count > 0
    row = jnp.cumsum(occupied.astype(jnp.int32)) - 1  # rank among occupied
    row_of_cell = jnp.where(occupied & (row < c_cap), row, c_cap)

    # per-particle slot: rank within its cell from the sorted order
    sorted_ids = bins.order
    sorted_cell = bins.cell_of[sorted_ids]  # (N,), sentinel num_cells if inactive
    in_grid = sorted_cell < num_cells
    safe_cell = jnp.minimum(sorted_cell, num_cells - 1)
    rank = jnp.arange(n, dtype=jnp.int32) - bins.cell_start[safe_cell]
    dest_row = row_of_cell[safe_cell]
    ok = in_grid & (rank >= 0) & (rank < k) & (dest_row < c_cap)
    flat = jnp.where(ok, dest_row * k + rank, c_cap * k)

    slot_pos = jnp.zeros((c_cap * k + 1, 3), cfg.dtype)
    slot_pos = slot_pos.at[flat].set(position[sorted_ids], mode="drop")
    slot_mask = jnp.zeros((c_cap * k + 1,), bool).at[flat].set(True, mode="drop")
    slot_ids = jnp.full((c_cap * k + 1,), -1, jnp.int32).at[flat].set(
        sorted_ids.astype(jnp.int32), mode="drop"
    )
    return CellSlots(
        positions=jnp.concatenate(
            [slot_pos[:-1].reshape(c_cap, k, 3), jnp.zeros((1, k, 3), cfg.dtype)]
        ),
        mask=jnp.concatenate(
            [slot_mask[:-1].reshape(c_cap, k), jnp.zeros((1, k), bool)]
        ),
        ids=jnp.concatenate(
            [slot_ids[:-1].reshape(c_cap, k), jnp.full((1, k), -1, jnp.int32)]
        ),
        row_of_cell=row_of_cell,
    )


CELL_CHUNK = 1 << 14  # occupied-cell rows per pairwise chunk


def correct_positions(
    position: jnp.ndarray,
    active: jnp.ndarray,
    bins: binning_mod.Binning,
    cfg: SimConfig,
    dt,
    key,
) -> jnp.ndarray:
    re = cfg.cell_size / jnp.sqrt(2.0).astype(cfg.dtype)
    k = cfg.max_neighbors_per_cell
    dims = jnp.asarray(cfg.grid_size, jnp.int32)
    slots = build_cell_slots(position, bins, cfg)
    c_cap = slots.positions.shape[0] - 1
    sink = c_cap

    # flat cell id of each occupied row (inverse of row_of_cell), for
    # neighbor-id arithmetic per row
    occupied = bins.cell_count > 0
    row = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    cell_ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    cell_of_row = jnp.full((c_cap + 1,), 0, jnp.int32).at[
        jnp.where(occupied & (row < c_cap), row, c_cap)
    ].set(cell_ids, mode="drop")

    chunk = min(CELL_CHUNK, c_cap)

    def springs_for_rows(args):
        row_base, key_chunk = args
        rows_here = row_base + jnp.arange(chunk, dtype=jnp.int32)
        rows_here = jnp.minimum(rows_here, sink)
        res_pos = slots.positions[rows_here]  # (C, K, 3)
        res_mask = slots.mask[rows_here]
        res_ids = slots.ids[rows_here]

        cell = cell_of_row[rows_here]
        idx3 = grids.unflatten_cell_index(cell, cfg)
        nrows = []
        for off in _NEIGHBOR_OFFSETS:
            n3 = idx3 + jnp.asarray(off, jnp.int32)
            inb = jnp.all((n3 >= 0) & (n3 < dims), axis=-1)
            nc = grids.flat_cell_index(jnp.clip(n3, 0), cfg)
            nc = jnp.clip(nc, 0, cfg.num_cells - 1)
            nrows.append(jnp.where(inb, slots.row_of_cell[nc], sink))
        nrows = jnp.stack(nrows, axis=1)  # (C, 27)

        nbr_pos = slots.positions[nrows].reshape(chunk, 27 * k, 3)
        nbr_mask = slots.mask[nrows].reshape(chunk, 27 * k)
        nbr_ids = slots.ids[nrows].reshape(chunk, 27 * k)

        # pairwise: (C, K residents, 27K neighbors)
        offset = res_pos[:, :, None, :] - nbr_pos[:, None, :, :]
        sq = jnp.sum(offset * offset, axis=-1)
        degenerate = sq < 1e-12

        kernel_lower = 1.0 - sq / (re * re)
        kernel = jnp.where(kernel_lower > 0.0, kernel_lower**3, 0.0)
        inv_dist = jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
        spring_terms = (kernel * inv_dist)[..., None] * offset

        valid = (
            res_mask[:, :, None]
            & nbr_mask[:, None, :]
            & (res_ids[:, :, None] != nbr_ids[:, None, :])
        )
        springs = jnp.sum(
            jnp.where((valid & ~degenerate)[..., None], spring_terms, 0.0), axis=2
        )
        # Near-coincident pairs contribute a uniform random force in [-1,1]^3
        # (ref simulation.cpp:585-589). One random vector per RESIDENT scaled
        # by its coincident-pair count — not per pair: a (C, K, 27K, 3) random
        # tensor is ~10^10 PRNG draws per step and dominates the whole pass.
        jitter = jax.random.uniform(
            key_chunk, res_pos.shape, cfg.dtype, minval=-1.0, maxval=1.0
        )
        deg_n = jnp.sum(valid & degenerate, axis=2).astype(cfg.dtype)  # (C, K)
        springs = springs + deg_n[..., None] * jitter
        return springs, res_ids  # (C, K, 3), (C, K)

    nchunk = (c_cap + chunk - 1) // chunk
    keys = jax.random.split(key, nchunk)
    bases = jnp.arange(nchunk, dtype=jnp.int32) * chunk
    if nchunk == 1:
        springs, ids = springs_for_rows((jnp.int32(0), keys[0]))
        springs = springs.reshape(-1, 3)
        ids = ids.reshape(-1)
    else:
        springs, ids = jax.lax.map(springs_for_rows, (bases, keys))
        springs = springs.reshape(-1, 3)
        ids = ids.reshape(-1)

    # scatter springs back to particles (each particle occupies one slot)
    n = position.shape[0]
    dest = jnp.where(ids >= 0, ids, n)
    spring = jnp.zeros((n + 1, 3), cfg.dtype).at[dest].set(springs, mode="drop")[:n]

    new_pos = position + spring * (dt * cfg.correction_stiffness * re)
    lo = jnp.asarray(cfg.domain_min, cfg.dtype)
    hi = jnp.asarray(cfg.domain_max, cfg.dtype)
    new_pos = jnp.clip(new_pos, lo, hi)
    return jnp.where(active[:, None], new_pos, position)
