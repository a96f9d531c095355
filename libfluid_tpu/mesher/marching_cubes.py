"""Marching cubes as a batched, differentiable table-lookup kernel.

Reference ``mesher::_marching_cubes`` (``mesher.cpp:400-515``): serial sweep
with rolling per-layer edge-midpoint caches for vertex dedup. The TPU version
drops the inherently serial dedup structure and emits an indexed *triangle
soup* with fixed capacity:

- corner sampling, case construction (bit i set iff value < 0,
  ``mesher.cpp:416``), edge interpolation (t = v1/(v1-v2),
  ``mesher.cpp:378-392``) are batched over all cells of a z-slab,
- a ``lax.scan`` over slabs compacts valid triangles into a static
  (max_triangles, 3, 3) buffer by rank-scatter (cumsum of the valid mask),
- vertex positions are differentiable w.r.t. the SDF node values through the
  edge interpolation (the discrete topology is piecewise constant — the
  correct marching-cubes gradient under the implicit function theorem).

Vertex dedup for watertight OBJ export is a host-side post-process
(:mod:`libfluid_tpu.io.obj`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libfluid_tpu.config import MesherConfig
from libfluid_tpu.mesher import tables
from libfluid_tpu.mesher.surface import sample_surface

MAX_TRIS_PER_CELL = 5


class MeshBuffers(NamedTuple):
    """Fixed-capacity triangle soup: `vertices[i]` is a (3, 3) triangle
    (rows = vertices, CCW as in the reference tables); entries past `count`
    are garbage."""

    vertices: jnp.ndarray  # (max_triangles, 3, 3)
    count: jnp.ndarray  # () int32

    @property
    def valid(self) -> jnp.ndarray:
        return jnp.arange(self.vertices.shape[0]) < self.count


def marching_cubes(sdf: jnp.ndarray, cfg: MesherConfig) -> MeshBuffers:
    """Extract the zero level set of `sdf` sampled on (nx+1, ny+1, nz+1) nodes."""
    nx, ny, nz = cfg.grid_size
    h = cfg.cell_size
    off = jnp.asarray(cfg.grid_offset, sdf.dtype)
    tri_table = jnp.asarray(tables.TRI_TABLE)  # (256, 16)
    edge_corners = jnp.asarray(tables.EDGE_CORNERS)  # (12, 2)
    corner_off = jnp.asarray(tables.CORNER_OFFSETS)  # (8, 3)

    cell_x, cell_y = jnp.meshgrid(
        jnp.arange(nx, dtype=jnp.int32), jnp.arange(ny, dtype=jnp.int32), indexing="ij"
    )
    cell_x = cell_x.reshape(-1)
    cell_y = cell_y.reshape(-1)
    ncell_slab = nx * ny

    def slab(carry, z):
        buf, count = carry
        # corner values for every cell in this slab: (C, 8)
        corners = []
        for ci in range(8):
            o = tables.CORNER_OFFSETS[ci]
            corners.append(sdf[cell_x + int(o[0]), cell_y + int(o[1]), z + int(o[2])])
        v = jnp.stack(corners, axis=-1)

        case = jnp.sum(
            (v < 0.0).astype(jnp.int32) * (1 << jnp.arange(8, dtype=jnp.int32)), axis=-1
        )

        # interpolated point on each of the 12 edges: (C, 12, 3)
        va = v[:, edge_corners[:, 0]]
        vb = v[:, edge_corners[:, 1]]
        denom = va - vb
        t = va / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
        cell_base = jnp.stack(
            [cell_x, cell_y, jnp.full_like(cell_x, z)], axis=-1
        ).astype(sdf.dtype)
        pa = cell_base[:, None, :] + corner_off[edge_corners[:, 0]].astype(sdf.dtype)
        pb = cell_base[:, None, :] + corner_off[edge_corners[:, 1]].astype(sdf.dtype)
        epos = off + h * (pa + (pb - pa) * t[..., None])

        # triangles: (C, 5, 3) edge ids
        tri_edges = tri_table[case][:, : 3 * MAX_TRIS_PER_CELL].reshape(
            -1, MAX_TRIS_PER_CELL, 3
        )
        tvalid = tri_edges[..., 0] >= 0
        # swap the last two edge ids: with this module's x-fastest corner
        # layout the raw table winds inward; the swap makes normals point
        # outward (along +grad(sdf)), which the renderer and OBJ export assume
        tri_edges = tri_edges[..., jnp.asarray([0, 2, 1])]
        safe_edges = jnp.maximum(tri_edges, 0)
        tverts = jnp.take_along_axis(
            epos[:, None, :, :].repeat(MAX_TRIS_PER_CELL, axis=1).reshape(
                ncell_slab * MAX_TRIS_PER_CELL, 12, 3
            ),
            safe_edges.reshape(-1, 3)[..., None].repeat(3, axis=-1),
            axis=1,
        )  # (C*5, 3, 3)
        tvalid = tvalid.reshape(-1)

        # compact into the global buffer at rank offsets
        rank = jnp.cumsum(tvalid.astype(jnp.int32)) - 1
        dest = jnp.where(tvalid, count + rank, buf.shape[0])  # drop invalid
        buf = buf.at[dest].set(tverts, mode="drop")
        count = count + jnp.sum(tvalid.astype(jnp.int32))
        return (buf, count), None

    buf0 = jnp.zeros((cfg.max_triangles, 3, 3), sdf.dtype)
    (buf, count), _ = jax.lax.scan(
        slab, (buf0, jnp.int32(0)), jnp.arange(nz, dtype=jnp.int32)
    )
    return MeshBuffers(vertices=buf, count=jnp.minimum(count, cfg.max_triangles))


def generate_mesh(
    position: jnp.ndarray,
    active: jnp.ndarray,
    cfg: MesherConfig,
    particle_radius: float | None = None,
) -> MeshBuffers:
    """particles -> SDF -> triangles (``mesher::generate_mesh``, ``mesher.cpp:320``)."""
    sdf = sample_surface(position, active, cfg, particle_radius)
    return marching_cubes(sdf, cfg)
