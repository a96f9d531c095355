"""Voxelizer tests: surface SAT vs brute force, flood-fill vs BFS oracle,
obstacle interiors on the sim grid (reference voxelizer.cpp / obstacle.cpp)."""

import numpy as np
import jax.numpy as jnp

from libfluid_tpu import voxelizer
from libfluid_tpu.config import SimConfig
from libfluid_tpu.renderer.scene import unit_box


def _uv_sphere(radius=1.0, center=(0, 0, 0), n_theta=12, n_phi=24):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in th:
        for p in ph:
            verts.append(
                [
                    np.sin(t) * np.cos(p),
                    np.cos(t),
                    np.sin(t) * np.sin(p),
                ]
            )
    verts = np.asarray(verts) * radius + np.asarray(center)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = a + n_phi
            d = b + n_phi
            idx += [a, c, b, b, c, d]
    return verts, np.asarray(idx)


def _bfs_exterior(surface: np.ndarray) -> np.ndarray:
    """Reference-style DFS flood fill (voxelizer.cpp:82-126) as the oracle."""
    ext = np.zeros_like(surface)
    if surface[0, 0, 0]:
        return ext
    stack = [(0, 0, 0)]
    ext[0, 0, 0] = True
    dims = surface.shape
    while stack:
        x, y, z = stack.pop()
        for dx, dy, dz in (
            (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)
        ):
            nx, ny, nz = x + dx, y + dy, z + dz
            if 0 <= nx < dims[0] and 0 <= ny < dims[1] and 0 <= nz < dims[2]:
                if not surface[nx, ny, nz] and not ext[nx, ny, nz]:
                    ext[nx, ny, nz] = True
                    stack.append((nx, ny, nz))
    return ext


def test_box_voxelization_interior():
    """A 4x4x4 box voxelized at h=1. Faces lie exactly on cell boundaries;
    like the reference's truncating candidate scan (voxelizer.cpp:66), the
    face plane marks the cell it fronts (cells 0 and 4) but not the
    touching-from-below cell, so the interior is the 3x3x3 core."""
    pos, idx = unit_box()
    pos = pos * 4.0 + 2.0  # box spanning [0,4]^3
    vox = voxelizer.voxelize(pos, idx, 1.0)
    interior = np.asarray(vox.interior)
    # interior cells in world coords: offset + index
    coords = np.argwhere(interior) + np.asarray(vox.offset)
    assert coords.shape[0] == 27
    assert coords.min() == 1 and coords.max() == 3
    # surface must separate interior from exterior
    assert not np.any(np.asarray(vox.exterior) & interior)


def test_exterior_matches_bfs_oracle():
    pos, idx = _uv_sphere(radius=3.0, center=(4.0, 4.5, 4.2))
    vox = voxelizer.voxelize(pos, idx, 1.0)
    surface = np.asarray(vox.surface)
    np.testing.assert_array_equal(np.asarray(vox.exterior), _bfs_exterior(surface))


def test_sphere_interior_volume():
    """Interior cell count approximates the sphere volume (minus the
    surface shell)."""
    r = 4.0
    pos, idx = _uv_sphere(radius=r, center=(6.0, 6.0, 6.0), n_theta=24, n_phi=48)
    vox = voxelizer.voxelize(pos, idx, 1.0)
    interior = int(np.asarray(vox.interior).sum())
    vol = 4.0 / 3.0 * np.pi * r**3
    # interior excludes the ~1-cell-thick surface shell: compare against
    # the volume of a radius-(r-1.5) ball as a loose lower bound
    lo = 4.0 / 3.0 * np.pi * (r - 1.7) ** 3
    assert lo < interior < vol


def test_obstacle_cells_on_sim_grid():
    cfg = SimConfig(grid_size=(16, 16, 16), cell_size=0.5,
                    grid_offset=(-1.0, -1.0, -1.0), particle_capacity=8)
    pos, idx = _uv_sphere(radius=1.5, center=(2.5, 2.5, 2.5))
    mask = np.asarray(voxelizer.obstacle_cells(pos, idx, cfg))
    assert mask.shape == cfg.grid_size
    assert mask.sum() > 0
    # all solid cells lie strictly inside the sphere: cell centers within r
    centers = (np.argwhere(mask) + 0.5) * cfg.cell_size + np.asarray(cfg.grid_offset)
    d = np.linalg.norm(centers - 2.5, axis=-1)
    assert d.max() < 1.5


def test_obstacle_crops_out_of_domain():
    cfg = SimConfig(grid_size=(8, 8, 8), cell_size=1.0, particle_capacity=8)
    # sphere centered outside the grid, overlapping its corner
    pos, idx = _uv_sphere(radius=3.0, center=(0.0, 0.0, 0.0))
    mask = np.asarray(voxelizer.obstacle_cells(pos, idx, cfg))
    assert mask.shape == cfg.grid_size
    assert mask.sum() > 0  # the overlapping octant
    assert not mask[4:].any()
