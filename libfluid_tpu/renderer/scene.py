"""Scene representation: flat SoA arrays + host-side builder.

Replaces the reference's entity registry / BVH scene (``scene.h/.cpp``).
Primitives live in two flat arrays (triangles in point+edges form with
precomputed geometric normals, ``primitive.h:40-71``; spheres as
affine-transformed unit spheres, ``primitive.h:74-98``), each row carrying a
material id into a :class:`~libfluid_tpu.renderer.materials.MaterialTable`.
``SceneBuilder`` plays the role of ``add_mesh_entity``/``add_primitive_entity``
/``finish`` (``scene.cpp:26-67``): meshes are pre-transformed and exploded to
triangles; ``finish`` pads the arrays to static capacity and collects emissive
triangles into the light list (with areas, for NEE/BDPT light sampling).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from libfluid_tpu.renderer import materials as mat_mod


class Scene(NamedTuple):
    # triangles
    tri_p0: jnp.ndarray  # (T, 3)
    tri_e1: jnp.ndarray  # (T, 3) edge to vertex 2
    tri_e2: jnp.ndarray  # (T, 3) edge to vertex 3
    tri_normal: jnp.ndarray  # (T, 3) unit geometric normal
    tri_mat: jnp.ndarray  # (T,) int32; 0 = padding/null
    # spheres (unit sphere through an affine transform)
    sph_to_world: jnp.ndarray  # (S, 3, 4)
    sph_to_local: jnp.ndarray  # (S, 3, 4)
    sph_mat: jnp.ndarray  # (S,) int32
    # materials
    materials: mat_mod.MaterialTable
    # emissive triangle lights
    light_tri: jnp.ndarray  # (L,) int32 indices into the triangle arrays
    light_area: jnp.ndarray  # (L,)
    light_mask: jnp.ndarray  # (L,) bool — valid entries (static capacity)
    # optional uniform-grid ray accelerator (renderer.accel); None = the
    # chunked brute-force intersector (fine for the canned few-tri scenes)
    accel: object = None


class SceneBuilder:
    """Host-side accumulation of primitives and materials; call
    :meth:`finish` once to produce the static-shape :class:`Scene` pytree."""

    def __init__(self):
        self._tris: List[np.ndarray] = []  # each (n, 3, 3): p0, p1, p2
        self._tri_mats: List[np.ndarray] = []
        self._sph_to_world: List[np.ndarray] = []
        self._sph_mats: List[int] = []
        # material 0 is the reserved null material
        self._kinds = [mat_mod.LAMBERTIAN]
        self._albedo = [(0.0, 0.0, 0.0)]
        self._ior = [1.0]
        self._emission = [(0.0, 0.0, 0.0)]
        self._albedo_tex = [0]
        self._emission_tex = [0]
        # texture 0 is the reserved 1x1 white texel ("no texture")
        self._textures: List[np.ndarray] = [np.ones((1, 1, 3))]

    def _packed_textures(self, dtype):
        """Stack all textures into one (NT, TH, TW, 3) array (padded to the
        largest); true sizes ride in ``tex_hw`` for uv scaling."""
        th = max(t.shape[0] for t in self._textures)
        tw = max(t.shape[1] for t in self._textures)
        out = np.zeros((len(self._textures), th, tw, 3))
        for i, t in enumerate(self._textures):
            out[i, : t.shape[0], : t.shape[1]] = t
        return jnp.asarray(out, dtype)

    def add_texture(self, texels) -> int:
        """Register an (H, W, 3) texture; returns its id for the material
        channels (reference ``channel<T>``, ``material.h:18-29``)."""
        t = np.asarray(texels, np.float64)
        if t.ndim != 3 or t.shape[2] != 3:
            raise ValueError(f"texture must be (H, W, 3), got {t.shape}")
        self._textures.append(t)
        return len(self._textures) - 1

    def add_material(
        self, kind, albedo=(0, 0, 0), ior=1.0, emission=(0, 0, 0),
        albedo_tex: int = 0, emission_tex: int = 0,
    ) -> int:
        self._kinds.append(int(kind))
        self._albedo.append(tuple(float(c) for c in albedo))
        self._ior.append(float(ior))
        self._emission.append(tuple(float(c) for c in emission))
        self._albedo_tex.append(int(albedo_tex))
        self._emission_tex.append(int(emission_tex))
        return len(self._kinds) - 1

    def lambertian(self, albedo, emission=(0, 0, 0), albedo_tex: int = 0,
                   emission_tex: int = 0) -> int:
        return self.add_material(
            mat_mod.LAMBERTIAN, albedo, emission=emission,
            albedo_tex=albedo_tex, emission_tex=emission_tex,
        )

    def mirror(self, albedo=(1, 1, 1)) -> int:
        return self.add_material(mat_mod.SPECULAR_REFLECTION, albedo)

    def glass(self, ior, skin=(1, 1, 1)) -> int:
        return self.add_material(mat_mod.SPECULAR_TRANSMISSION, skin, ior=ior)

    def add_mesh(self, positions, indices, material: int, transform: Optional[np.ndarray] = None):
        """Add a triangle mesh, pre-transformed like ``scene::add_mesh_entity``
        (``scene.cpp:26-48``). `positions` (V,3), `indices` flat (3k,)."""
        pos = np.asarray(positions, np.float64)
        if transform is not None:
            m = np.asarray(transform, np.float64)
            pos = pos @ m[:, :3].T + m[:, 3]
        idx = np.asarray(indices, np.int64).reshape(-1, 3)
        tris = pos[idx]  # (n, 3, 3)
        self._tris.append(tris)
        self._tri_mats.append(np.full((tris.shape[0],), material, np.int32))

    def add_triangle_soup(self, vertices, material: int):
        """Add raw triangles (n, 3, 3) — e.g. a marching-cubes MeshBuffers."""
        tris = np.asarray(vertices, np.float64).reshape(-1, 3, 3)
        self._tris.append(tris)
        self._tri_mats.append(np.full((tris.shape[0],), material, np.int32))

    def add_sphere(self, transform, material: int):
        """Affine-transformed unit sphere (``primitive.h:74-98``)."""
        self._sph_to_world.append(np.asarray(transform, np.float64).reshape(3, 4))
        self._sph_mats.append(material)

    def finish(
        self,
        tri_capacity: Optional[int] = None,
        light_capacity: Optional[int] = None,
        dtype=jnp.float32,
    ) -> Scene:
        if self._tris:
            tris = np.concatenate(self._tris, axis=0)
            tmat = np.concatenate(self._tri_mats, axis=0)
        else:
            tris = np.zeros((0, 3, 3))
            tmat = np.zeros((0,), np.int32)
        n = tris.shape[0]
        cap = tri_capacity or max(n, 1)
        if n > cap:
            raise ValueError(f"triangle capacity {cap} < {n}")
        p0 = np.zeros((cap, 3))
        e1 = np.zeros((cap, 3))
        e2 = np.zeros((cap, 3))
        nrm = np.zeros((cap, 3))
        nrm[:, 1] = 1.0
        mats = np.zeros((cap,), np.int32)
        if n:
            p0[:n] = tris[:, 0]
            e1[:n] = tris[:, 1] - tris[:, 0]
            e2[:n] = tris[:, 2] - tris[:, 0]
            cr = np.cross(e1[:n], e2[:n])
            ln = np.linalg.norm(cr, axis=-1, keepdims=True)
            nrm[:n] = cr / np.maximum(ln, 1e-30)
            mats[:n] = tmat

        emission = np.asarray(self._emission)
        is_light = np.zeros((cap,), bool)
        if n:
            is_light[:n] = np.abs(emission[mats[:n]]).sum(-1) > 1e-9
        light_idx = np.flatnonzero(is_light)
        areas = 0.5 * np.linalg.norm(np.cross(e1[light_idx], e2[light_idx]), axis=-1)
        lcap = light_capacity or max(light_idx.size, 1)
        li = np.zeros((lcap,), np.int32)
        la = np.zeros((lcap,))
        lm = np.zeros((lcap,), bool)
        li[: light_idx.size] = light_idx
        la[: light_idx.size] = areas
        lm[: light_idx.size] = True

        s = len(self._sph_to_world)
        stw = np.zeros((max(s, 1), 3, 4))
        stl = np.zeros((max(s, 1), 3, 4))
        smat = np.zeros((max(s, 1),), np.int32)
        stw[:, :, :3] = np.eye(3)
        stl[:, :, :3] = np.eye(3)
        for i, m in enumerate(self._sph_to_world):
            stw[i] = m
            rinv = np.linalg.inv(m[:, :3])
            stl[i, :, :3] = rinv
            stl[i, :, 3] = -rinv @ m[:, 3]
            smat[i] = self._sph_mats[i]
        if s == 0:
            # degenerate sphere at infinity: never hit (the local->world AND
            # world->local translations must both push it away — rays are
            # intersected in local space)
            stw[:, :, 3] = 1e30
            stl[:, :, 3] = 1e30

        return Scene(
            tri_p0=jnp.asarray(p0, dtype),
            tri_e1=jnp.asarray(e1, dtype),
            tri_e2=jnp.asarray(e2, dtype),
            tri_normal=jnp.asarray(nrm, dtype),
            tri_mat=jnp.asarray(mats),
            sph_to_world=jnp.asarray(stw, dtype),
            sph_to_local=jnp.asarray(stl, dtype),
            sph_mat=jnp.asarray(smat),
            materials=mat_mod.MaterialTable(
                kind=jnp.asarray(self._kinds, jnp.int32),
                albedo=jnp.asarray(self._albedo, dtype),
                ior=jnp.asarray(self._ior, dtype),
                emission=jnp.asarray(emission, dtype),
                albedo_tex=jnp.asarray(self._albedo_tex, jnp.int32),
                emission_tex=jnp.asarray(self._emission_tex, jnp.int32),
                textures=self._packed_textures(dtype),
                tex_hw=jnp.asarray(
                    [[t.shape[0], t.shape[1]] for t in self._textures],
                    jnp.int32,
                ),
            ),
            light_tri=jnp.asarray(li),
            light_area=jnp.asarray(la, dtype),
            light_mask=jnp.asarray(lm),
        )


def inject_mesh(scene: Scene, vertices, valid, material: int) -> Scene:
    """Append a device-resident triangle soup to a scene, differentiably.

    The reference rebuilds the scene per frame on the host (mesher thread ->
    ``scene::add_mesh_entity``, ``testbed/main.cpp:363-401``); here the
    triangles stay on device and the update is pure jnp, so gradients flow
    from rendered pixels through the triangle vertices — the missing link of
    the pixels -> marching-cubes surface -> particle positions chain
    (BASELINE "pixel-grad allclose", ref ``mesher.cpp:378-392``).

    `vertices` is (T, 3, 3) (rows = the 3 triangle vertices, e.g.
    ``MeshBuffers.vertices``); `valid` is (T,) bool. Invalid rows get the
    null material and a zero normal — zero-area triangles never intersect
    (NaN-t = miss, ref ``intersection.h:26-28``). The injected mesh is
    assumed non-emissive (fluid surfaces), so the light list is unchanged;
    any scene accelerator is dropped (it indexes the old triangle array).
    """
    p0 = vertices[:, 0]
    e1 = vertices[:, 1] - vertices[:, 0]
    e2 = vertices[:, 2] - vertices[:, 0]
    cr = jnp.cross(e1, e2)
    # degenerate (zero-area) rows: route the normalize through a unit
    # placeholder — d|cr|/dcr at cr=0 is NaN, and 0 * NaN poisons the VJP.
    # Covers invalid rows AND valid-but-degenerate MC output (edge vertex
    # exactly on a cube corner); such triangles never intersect anyway.
    ok = jnp.sum(cr * cr, axis=-1, keepdims=True) > 1e-20
    safe = jnp.where(ok, cr, jnp.asarray([1.0, 0.0, 0.0], cr.dtype))
    ln = jnp.linalg.norm(safe, axis=-1, keepdims=True)
    # degenerate rows keep the builder's unit-Y padding normal — a zero
    # normal NaNs the shading-frame math downstream
    unit_y = jnp.asarray([0.0, 1.0, 0.0], cr.dtype)
    nrm = jnp.where(ok, safe / jnp.maximum(ln, 1e-30), unit_y)
    validf = valid[:, None].astype(p0.dtype)
    mats = jnp.where(valid, jnp.int32(material), 0)
    return scene._replace(
        tri_p0=jnp.concatenate([scene.tri_p0, p0 * validf]),
        tri_e1=jnp.concatenate([scene.tri_e1, e1 * validf]),
        tri_e2=jnp.concatenate([scene.tri_e2, e2 * validf]),
        tri_normal=jnp.concatenate(
            [scene.tri_normal, jnp.where(valid[:, None], nrm, unit_y)]
        ),
        tri_mat=jnp.concatenate([scene.tri_mat, mats]),
        accel=None,
    )


# unit geometry factories (ref test_scenes.cpp:10-53)

def unit_plane():
    """y=0 quad spanning [-0.5, 0.5]^2 in xz, +y normal."""
    pos = np.array(
        [[-0.5, 0, -0.5], [0.5, 0, -0.5], [0.5, 0, 0.5], [-0.5, 0, 0.5]]
    )
    idx = np.array([0, 1, 2, 0, 2, 3])
    return pos, idx


def unit_box():
    pos = np.array(
        [
            [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
            [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
        ]
    )
    idx = np.array(
        [
            0, 3, 1, 3, 2, 1,
            1, 2, 5, 2, 6, 5,
            5, 6, 4, 6, 7, 4,
            4, 7, 0, 7, 3, 0,
            3, 7, 2, 7, 6, 2,
            4, 0, 5, 0, 1, 5,
        ]
    )
    return pos, idx
