"""Wavefront OBJ export (reference ``mesh::save_obj``, ``mesh.h:56-99``).

Takes the mesher's fixed-capacity triangle soup; vertices are deduplicated
host-side (the reference dedups during extraction with rolling edge caches,
``mesher.cpp:394-407`` — a serial structure that has no place on TPU)."""

from __future__ import annotations

import numpy as np


def dedup_triangles(vertices: np.ndarray, count: int, decimals: int = 6):
    """(T, 3, 3) soup -> (positions (V,3), indices (F,3))."""
    tris = np.asarray(vertices)[: int(count)].reshape(-1, 3)
    keys = np.round(tris, decimals)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    return uniq, inv.reshape(-1, 3)


def save_obj(path, vertices, count=None, normals=None):
    """Write a triangle soup (or (V,3)+(F,3) pair) as OBJ."""
    vertices = np.asarray(vertices)
    if vertices.ndim == 3:
        n = vertices.shape[0] if count is None else int(count)
        pos, idx = dedup_triangles(vertices, n)
    else:
        pos, idx = vertices, np.asarray(count)
    with open(path, "w") as f:
        for p in pos:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if normals is not None:
            for nrm in normals:
                f.write(f"vn {nrm[0]} {nrm[1]} {nrm[2]}\n")
        for t in idx:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def load_obj(path):
    pos, idx = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                pos.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx.append([int(p.split("/")[0]) - 1 for p in parts[1:4]])
    return np.asarray(pos), np.asarray(idx)
