"""Sort-based particle binning and fixed-capacity neighbor gathers.

Replaces the reference's ``hash_particles`` (``simulation.cpp:266-291``): the
reference sorts the particle vector by raw cell index and records (begin,
count) per cell. Here the particles stay in place; a permutation (argsort by
cell id) plus per-cell start offsets give the same structure without mutating
the SoA arrays — and the sort/searchsorted pair is XLA-native and shardable.

Inactive particles sort to a sentinel cell past the end so they never appear
in any neighborhood.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig


class Binning(NamedTuple):
    """Cell-index structure over the particle SoA.

    VALIDITY CAVEAT: ``order``/``cell_start`` describe cell-contiguous runs
    and are only meaningful when produced by :func:`bin_particles` /
    :func:`sort_by_cell`. ``slotsort.sort_and_build`` permutes the SoA into
    RANK-major order (all rank-0 particles of every cell first), where no
    cell-contiguous runs exist — a Binning from that path carries valid
    ``cell_of``/``cell_count``/``occupancy`` only; neighbor access there goes
    through the SlotGrid, not :func:`gather_neighbors`.
    """

    order: jnp.ndarray  # (N,) particle ids sorted by cell (see caveat above)
    cell_of: jnp.ndarray  # (N,) flat cell id per particle (sentinel = num_cells)
    cell_start: jnp.ndarray  # (C,) index into `order` of each cell's first particle
    cell_count: jnp.ndarray  # (C,) particles per cell
    occupancy: jnp.ndarray  # (nx, ny, nz) particles per cell, reshaped


def bin_particles(position: jnp.ndarray, active: jnp.ndarray, cfg: SimConfig) -> Binning:
    num_cells = cfg.num_cells
    idx3 = grids.cell_index_of(position, cfg)
    cell = grids.flat_cell_index(idx3, cfg)
    cell = jnp.where(active, cell, num_cells)  # park inactive past the end
    order = jnp.argsort(cell)
    counts = jax.ops.segment_sum(
        jnp.ones_like(cell, jnp.int32), cell, num_segments=num_cells + 1
    )[:num_cells]
    # start of each cell's run in `order` = exclusive prefix sum of counts
    # (equivalent to searchsorted over the sorted keys, but one dense cumsum
    # instead of 2M binary searches)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)[:-1]]
    )
    return Binning(
        order=order,
        cell_of=cell,
        cell_start=cell_start,
        cell_count=counts,
        occupancy=counts.reshape(cfg.grid_size),
    )


def sort_by_cell(state, cfg: SimConfig):
    """Bin and physically reorder the particle SoA arrays into cell order.

    Replaces the reference's in-place ``std::sort`` of the particle vector
    (``hash_particles``, ``simulation.cpp:266-291``) — and for the same
    reason: every downstream neighborhood structure (the slot grid, overflow
    compaction, per-cell runs) wants each cell's particles contiguous. One
    (N, 16) row gather here makes the slot-grid scatter a sorted-unique
    scatter and gives every later per-particle pass locality.

    Returns (state, bins) where the state's particle arrays are permuted and
    ``bins.order`` is the identity.
    """
    bins = bin_particles(state.position, state.active, cfg)
    o = bins.order
    n = o.shape[0]
    # ONE (N, 16) row gather for all float payload (contiguous 64-byte rows),
    # instead of four narrow gathers — the permuted arrays are then views.
    # The same 16-column payload row is what the slot-grid scatter writes.
    payload = jnp.concatenate(
        [state.position, state.velocity, state.affine.reshape(n, 9)], axis=1
    )[o]
    cell_sorted = bins.cell_of[o]
    state = state._replace(
        position=payload[:, 0:3],
        velocity=payload[:, 3:6],
        affine=payload[:, 6:15].reshape(n, 3, 3),
        # inactive particles were keyed to the sentinel cell, so the sorted
        # active mask needs no gather of its own
        active=cell_sorted < cfg.num_cells,
    )
    return state, bins._replace(
        order=jnp.arange(n, dtype=o.dtype), cell_of=cell_sorted
    )


def gather_neighbors(
    binning: Binning,
    position: jnp.ndarray,
    cfg: SimConfig,
    max_per_cell: int | None = None,
):
    """For every particle, gather candidate neighbor particle ids from the
    3x3x3 cell neighborhood, up to `max_per_cell` per cell.

    Replaces ``_for_all_nearby_particles`` (``simulation.h:212-223``) for the
    position-correction pass. Returns (ids, valid) of shape
    (N, 27 * max_per_cell); `valid` masks slots past each cell's count and
    out-of-range cells. Cells holding more than `max_per_cell` particles
    contribute only their first `max_per_cell` (in cell-sorted order) — a
    fixed-capacity truncation required for static shapes; with the default
    seeding of 8 particles/cell and capacity ``cfg.max_neighbors_per_cell``
    (12) truncation is rare.
    """
    k = cfg.max_neighbors_per_cell if max_per_cell is None else max_per_cell
    nx, ny, nz = cfg.grid_size
    idx3 = grids.cell_index_of(position, cfg)

    ids_all = []
    valid_all = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                n3 = idx3 + jnp.array([dx, dy, dz], jnp.int32)
                inb = jnp.all(
                    (n3 >= 0) & (n3 < jnp.array([nx, ny, nz], jnp.int32)), axis=-1
                )
                c = grids.flat_cell_index(jnp.clip(n3, 0), cfg)
                c = jnp.clip(c, 0, cfg.num_cells - 1)
                start = binning.cell_start[c]
                count = binning.cell_count[c]
                slot = jnp.arange(k, dtype=jnp.int32)[None, :]
                pos_in_order = jnp.clip(
                    start[:, None] + slot, 0, binning.order.shape[0] - 1
                )
                ids = binning.order[pos_in_order]
                valid = inb[:, None] & (slot < count[:, None])
                ids_all.append(ids)
                valid_all.append(valid)
    return jnp.concatenate(ids_all, axis=1), jnp.concatenate(valid_all, axis=1)
