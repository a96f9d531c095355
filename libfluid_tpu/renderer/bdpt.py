"""Bidirectional path tracer as a fixed-depth wavefront with MIS.

Replaces the reference's recursive BDPT (``bidirectional_path_tracer.cpp``):
per camera ray it traces a camera subpath and a light subpath
(``_trace_path``, ``:82-134``), connects every (s, t) prefix pair — direct
emission hits (s=0, ``:319-326``), the light vertex itself (s=1, ``:328-355``),
and generic connections with a geometry term and a visibility ray
(``:357-383``) — and weighs each strategy with the balance heuristic computed
by a pdf-ratio sweep (``:136-250``).

TPU re-formulation (SURVEY.md §7 hard part 5): variable path lengths become
*fixed-capacity vertex arrays with validity masks*, built by a ``lax.scan``
over bounces; the O(s·t) connection loop is unrolled at trace time over
static (s, t), and all connection visibility rays are batched into ONE
scene cast, so the work stays dense on the wavefront. Per-vertex
forward/reverse pdfs are stored in *area measure*; the per-connection
junction pdfs are recomputed exactly as the reference's scoped
pdf-reassignment does (``:145-176``).

Conventions:
- camera vertices x1..xT (x0 = the pinhole) live at array index i = 0..T-1;
  strategy t counts camera vertices *including* the pinhole, so the strategy
  connecting at array index i has t = i + 2.
- light vertices y0..y_{S-1}; in MIS space index j is vertex y_j and the
  strategy connecting at y_j has s = j + 1 (s = 0: no light vertex).
- strategies with t < 2 (light rays hitting the lens) are not sampled — the
  reference's tracer is also per-camera-ray — and are therefore excluded
  from every balance-heuristic denominator.
- area lights emit from their geometric-normal side with a cosine
  distribution, matching the reference's light-ray sampling (``:296-313``).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.math import warping
from libfluid_tpu.renderer import intersect, materials
from libfluid_tpu.renderer.scene import Scene

_RAY_OFFSET = 1e-3
_EPS = 1e-8


class Subpath(NamedTuple):
    """Per-ray vertex arrays, depth-major: every field is (D, R, ...)."""

    pos: jnp.ndarray  # (D, R, 3)
    normal: jnp.ndarray  # (D, R, 3) unit geometric normal
    wo: jnp.ndarray  # (D, R, 3) unit direction toward the predecessor
    mat_id: jnp.ndarray  # (D, R)
    uv: jnp.ndarray  # (D, R, 2) surface uv (textured channels)
    valid: jnp.ndarray  # (D, R)
    delta: jnp.ndarray  # (D, R) bsdf at this vertex is specular
    beta: jnp.ndarray  # (D, R, 3) throughput arriving at this vertex
    pdf_fwd: jnp.ndarray  # (D, R) area pdf of generating this vertex
    pdf_rev: jnp.ndarray  # (D, R) area pdf of re-generating it from its successor
    start_rev: jnp.ndarray  # (R,) area pdf of re-generating the *start point*
    # (camera / light sample) from the first vertex


def _dir_and_dist2(a, b):
    """Unit direction a->b and squared distance, guarded."""
    d = b - a
    d2 = jnp.maximum(jnp.sum(d * d, axis=-1), _EPS)
    return d * jax.lax.rsqrt(d2)[..., None], d2


def _to_area(pdf_dir, cos_at, dist2):
    """Solid-angle pdf at the source -> area pdf at the destination."""
    return pdf_dir * jnp.abs(cos_at) / dist2


def _tangent(frame, v):
    return jnp.einsum("...ij,...j->...i", frame, v)


def _from_tangent(frame, v):
    return jnp.einsum("...ji,...j->...i", frame, v)


def trace_subpath(
    scene: Scene,
    o0: jnp.ndarray,
    d0: jnp.ndarray,
    beta0: jnp.ndarray,
    pdf_dir0: jnp.ndarray,
    prev_pos: jnp.ndarray,
    prev_normal: jnp.ndarray,
    key,
    depth: int,
    mode: int,
) -> Subpath:
    """March `depth` bounces from (o0, d0); mirrors ``_trace_path``
    (``bidirectional_path_tracer.cpp:82-134``) as a scan with masks.

    `pdf_dir0` is the solid-angle pdf of d0 at the start point; `prev_*`
    describe that start point (camera pinhole or light sample) so its
    reverse pdf can be produced by the first bounce.
    """
    r = o0.shape[0]
    dtype = o0.dtype
    alive0 = jnp.ones((r,), bool)

    def bounce(carry, k):
        o, d, beta, pdf_dir, p_pos, p_nrm, alive = carry
        rec = intersect.ray_cast(scene, o, d)
        valid = alive & rec.hit

        to_v, d2 = _dir_and_dist2(p_pos, rec.position)
        pdf_fwd = _to_area(pdf_dir, jnp.sum(rec.normal * to_v, axis=-1), d2)

        frame = intersect.tangent_frame(rec.normal)
        win = _tangent(frame, -d)
        xi = jax.random.uniform(k, (r, 2), dtype)
        samp = materials.sample_bsdf(scene.materials, rec.mat_id, win, xi, mode, uv=rec.uv)
        new_d = _from_tangent(frame, samp.direction)

        # reverse pdf of the *previous* vertex: this vertex's bsdf sampling
        # the direction back toward it (photon arriving along the new
        # direction), converted to area measure at the previous point
        p_rev_dir = materials.pdf_bsdf(
            scene.materials, rec.mat_id, samp.direction, win
        )
        to_prev, pd2 = _dir_and_dist2(rec.position, p_pos)
        pdf_rev_prev = _to_area(p_rev_dir, jnp.sum(p_nrm * to_prev, axis=-1), pd2)
        pdf_rev_prev = jnp.where(valid, pdf_rev_prev, 0.0)

        atten = samp.reflectance * (
            jnp.abs(samp.direction[..., 1]) / jnp.maximum(samp.pdf, 1e-12)
        )[..., None]
        beta_next = beta * atten
        off = jnp.where(samp.direction[..., 1] > 0.0, 1.0, -1.0)
        new_o = rec.position + rec.normal * (off * _RAY_OFFSET)[:, None]

        vertex = dict(
            pos=rec.position,
            normal=rec.normal,
            wo=-d,
            mat_id=jnp.where(valid, rec.mat_id, 0),
            uv=rec.uv,
            valid=valid,
            delta=samp.is_delta & valid,
            beta=beta,
            pdf_fwd=jnp.where(valid, pdf_fwd, 0.0),
            pdf_rev_prev=pdf_rev_prev,
        )
        alive_next = valid & (samp.pdf > 1e-12) & (jnp.max(beta_next, -1) > 1e-9)
        carry = (
            jnp.where(valid[:, None], new_o, o),
            jnp.where(valid[:, None], new_d, d),
            jnp.where(valid[:, None], beta_next, beta),
            jnp.where(valid, samp.pdf, pdf_dir),
            jnp.where(valid[:, None], rec.position, p_pos),
            jnp.where(valid[:, None], rec.normal, p_nrm),
            alive_next,
        )
        return carry, vertex

    d0n = d0 / jnp.maximum(jnp.linalg.norm(d0, axis=-1, keepdims=True), 1e-30)
    keys = jax.random.split(key, depth)
    _, out = jax.lax.scan(
        bounce, (o0, d0n, beta0, pdf_dir0, prev_pos, prev_normal, alive0), keys
    )
    # pdf_rev of vertex i is produced by bounce i+1 (its successor); the
    # first bounce's value is the reverse pdf of the start point
    rev = jnp.concatenate(
        [out["pdf_rev_prev"][1:], jnp.zeros((1, r), dtype)], axis=0
    )
    return Subpath(
        pos=out["pos"],
        normal=out["normal"],
        wo=out["wo"],
        mat_id=out["mat_id"],
        uv=out["uv"],
        valid=out["valid"],
        delta=out["delta"],
        beta=out["beta"],
        pdf_fwd=out["pdf_fwd"],
        pdf_rev=rev,
        start_rev=out["pdf_rev_prev"][0],
    )


class LightSample(NamedTuple):
    pos: jnp.ndarray  # (R, 3)
    normal: jnp.ndarray  # (R, 3)
    emission: jnp.ndarray  # (R, 3)
    pdf_area: jnp.ndarray  # (R,)
    valid: jnp.ndarray  # (R,)
    uv: jnp.ndarray  # (R, 2) barycentric uv of the sampled point


def sample_light_point(scene: Scene, key, r: int, dtype=jnp.float32) -> LightSample:
    """Area-weighted light-triangle pick + uniform point on it.

    The reference picks a light uniformly then samples its area
    (``:274-283``); area-weighted picking gives pdf_area = 1/total_area for
    every point — the same estimator family with lower variance.
    """
    area = jnp.where(scene.light_mask, scene.light_area, 0.0)
    total = jnp.sum(area)
    k1, k2 = jax.random.split(key)
    logits = jnp.log(jnp.maximum(area, 1e-30))
    idx = jax.random.categorical(k1, jnp.broadcast_to(logits, (r, area.shape[0])))
    tri = scene.light_tri[idx]
    xi = jax.random.uniform(k2, (r, 2), dtype)
    su = jnp.sqrt(xi[:, 0])
    b1 = 1.0 - su
    b2 = xi[:, 1] * su
    p = (
        scene.tri_p0[tri]
        + scene.tri_e1[tri] * b1[:, None]
        + scene.tri_e2[tri] * b2[:, None]
    )
    uv = jnp.stack([b1, b2], axis=-1)
    return LightSample(
        pos=p,
        normal=scene.tri_normal[tri],
        emission=materials.emission_at(scene.materials, scene.tri_mat[tri], uv),
        pdf_area=jnp.full((r,), 1.0, dtype) / jnp.maximum(total, 1e-30),
        valid=jnp.broadcast_to(total > 0.0, (r,)),
        uv=uv,
    )


class _Chain:
    """Uniform per-vertex pdf/delta view for the MIS sweep: lists indexed by
    MIS vertex position, each entry an (R,) array."""

    def __init__(self, pdf_fwd: List, pdf_rev: List, delta: List):
        self.pdf_fwd = pdf_fwd
        self.pdf_rev = pdf_rev
        self.delta = delta


def _camera_chain(cam: Subpath) -> _Chain:
    d = cam.pdf_fwd.shape[0]
    return _Chain(
        pdf_fwd=[cam.pdf_fwd[i] for i in range(d)],
        pdf_rev=[cam.pdf_rev[i] for i in range(d)],
        delta=[cam.delta[i] for i in range(d)],
    )


def _light_chain(y0: LightSample, lig: Optional[Subpath], r: int) -> _Chain:
    """MIS view of the light side: index 0 = y0, index j >= 1 = lig[j-1]."""
    pdf_fwd = [y0.pdf_area]
    pdf_rev = [lig.start_rev if lig is not None else jnp.zeros((r,))]
    delta = [jnp.zeros((r,), bool)]
    if lig is not None:
        d = lig.pdf_fwd.shape[0]
        pdf_fwd += [lig.pdf_fwd[j] for j in range(d)]
        pdf_rev += [lig.pdf_rev[j] for j in range(d)]
        delta += [lig.delta[j] for j in range(d)]
    return _Chain(pdf_fwd, pdf_rev, delta)


def _ratio(num, den):
    return num / jnp.where(den > _EPS, den, 1.0)


def _mis_weight(
    cam: _Chain,
    lig: Optional[_Chain],
    i_cam: int,
    j_lig: int,
    rev_cam_last,
    rev_cam_prev,
    rev_lig_last,
    rev_lig_prev,
):
    """Balance-heuristic weight for the strategy connecting camera array
    index `i_cam` (t = i_cam + 2) with light MIS index `j_lig` (s = j_lig+1;
    j_lig = -1 for s = 0, lig = None).

    Walks pdf ratios outward from the junction; each step i adds the
    competing strategy that moves vertex boundary past position i. The four
    junction-adjacent reverse pdfs are substituted (the reference's scoped
    reassignment, ``bidirectional_path_tracer.cpp:145-176``). Strategies
    whose connection straddles a delta vertex have zero pdf and are skipped;
    strategies with t < 2 are never sampled and never appear.
    """
    total = jnp.ones_like(rev_cam_last)

    def rev_cam(i):
        if i == i_cam:
            return rev_cam_last
        if i == i_cam - 1:
            return rev_cam_prev
        return cam.pdf_rev[i]

    ri = 1.0
    for i in range(i_cam, 0, -1):
        ri = ri * _ratio(rev_cam(i), cam.pdf_fwd[i])
        connectable = ~cam.delta[i] & ~cam.delta[i - 1]
        total = total + jnp.where(connectable, ri, 0.0)

    if lig is not None:

        def rev_lig(j):
            if j == j_lig:
                return rev_lig_last
            if j == j_lig - 1:
                return rev_lig_prev
            return lig.pdf_rev[j]

        ri = 1.0
        for j in range(j_lig, -1, -1):
            ri = ri * _ratio(rev_lig(j), lig.pdf_fwd[j])
            prev_ok = ~lig.delta[j - 1] if j > 0 else True
            total = total + jnp.where(~lig.delta[j] & prev_ok, ri, 0.0)

    return 1.0 / total


def trace_rays(
    scene: Scene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    key: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """BDPT radiance estimate for a batch of camera rays -> (R, 3).

    Drop-in alternative to the naive tracer
    (:func:`libfluid_tpu.renderer.pathtrace.trace_rays`), like the
    reference's two ``incoming_light`` entry points.
    """
    r = origins.shape[0]
    dtype = origins.dtype
    t_depth = cfg.max_camera_bounces
    s_depth = cfg.max_light_bounces
    k_cam, k_l0, k_ldir, k_lpath, k_s1 = jax.random.split(key, 5)

    # --- camera subpath ------------------------------------------------------
    d0n = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-30
    )
    cam = trace_subpath(
        scene,
        origins,
        directions,
        jnp.ones((r, 3), dtype),
        jnp.ones((r,), dtype),  # pinhole direction pdf: t<2 excluded, cancels
        origins,
        d0n,
        k_cam,
        t_depth,
        materials.RADIANCE,
    )

    # --- light subpath: y0 on a light, cosine-emitted continuation ----------
    y0 = sample_light_point(scene, k_l0, r, dtype)
    xi = jax.random.uniform(k_ldir, (r, 2), dtype)
    frame0 = intersect.tangent_frame(y0.normal)
    dloc = warping.unit_hemisphere_cosine_from_unit_square(xi)  # z-up
    d_tan = jnp.stack([dloc[..., 0], dloc[..., 2], dloc[..., 1]], axis=-1)
    d0 = _from_tangent(frame0, d_tan)
    cos0 = jnp.abs(d_tan[..., 1])
    pdf_dir0 = jnp.maximum(cos0 / jnp.pi, 1e-12)

    beta_y0 = y0.emission / y0.pdf_area[:, None]
    lig = None
    if s_depth >= 2:
        lig = trace_subpath(
            scene,
            y0.pos + y0.normal * _RAY_OFFSET,
            d0,
            beta_y0 * (cos0 / pdf_dir0)[:, None],
            pdf_dir0,
            y0.pos,
            y0.normal,
            k_lpath,
            s_depth - 1,
            materials.IMPORTANCE,
        )
        lig = lig._replace(valid=lig.valid & y0.valid[None, :])

    cam_chain = _camera_chain(cam)
    lig_chain = _light_chain(y0, lig, r)
    radiance = jnp.zeros((r, 3), dtype)

    # ========== s = 0: camera path hits an emitter (ref :319-326) ==========
    for i in range(t_depth):
        emis = materials.emission_at(scene.materials, cam.mat_id[i], cam.uv[i])
        is_emitter = jnp.max(emis, axis=-1) > 0.0
        front = jnp.sum(cam.normal[i] * cam.wo[i], axis=-1) > 0.0
        ok = cam.valid[i] & is_emitter & front
        contrib = cam.beta[i] * emis

        rev_last = jnp.broadcast_to(y0.pdf_area, (r,))  # light-point pdf
        if i >= 1:
            to_prev, d2 = _dir_and_dist2(cam.pos[i], cam.pos[i - 1])
            cos_l = jnp.sum(cam.normal[i] * to_prev, axis=-1)
            rev_prev = _to_area(
                jnp.abs(cos_l) / jnp.pi,
                jnp.sum(cam.normal[i - 1] * to_prev, axis=-1),
                d2,
            )
        else:
            rev_prev = jnp.zeros((r,), dtype)
        w = _mis_weight(cam_chain, None, i, -1, rev_last, rev_prev, None, None)
        radiance = radiance + jnp.where(ok[:, None], w[:, None] * contrib, 0.0)

    # ========== s >= 1, t >= 2 connections (ref :328-383) ===================
    # s=1 draws a FRESH light point per camera vertex, like the reference
    # (bidirectional_path_tracer.cpp:328-341) — reusing the light-subpath
    # origin is unbiased but correlates the s=1 strategies of one sample.
    # With area-weighted light picking the point pdf is the constant
    # 1/total_area, so the MIS chain's y0 entry needs no substitution.
    y1 = [
        sample_light_point(scene, jax.random.fold_in(k_s1, i), r, dtype)
        for i in range(t_depth)
    ]
    pairs: List[Tuple[int, int]] = []
    for i in range(t_depth):
        for j in range(s_depth):
            pairs.append((i, j))  # j is the MIS light index (y_j)

    def light_pos(j, i):
        return y1[i].pos if j == 0 else lig.pos[j - 1]

    # visibility for every connection, batched into large wavefronts: with a
    # ray accelerator, wall-clock scales with total rays rather than with the
    # number of (s, t) strategies (the reference serializes these casts per
    # sample, bidirectional_path_tracer.cpp:357-383; round 1 serialized them
    # per strategy via lax.map)
    p1 = jnp.stack([cam.pos[i] for i, _ in pairs], axis=0)
    p2 = jnp.stack([light_pos(j, i) for i, j in pairs], axis=0)
    npairs = len(pairs)
    group = max(1, min(npairs, (1 << 18) // max(r, 1)))
    vis_chunks = []
    for g0 in range(0, npairs, group):
        g = min(group, npairs - g0)
        v = intersect.test_visibility(
            scene,
            p1[g0 : g0 + g].reshape(g * r, 3),
            p2[g0 : g0 + g].reshape(g * r, 3),
        )
        vis_chunks.append(v.reshape(g, r))
    vis = jnp.concatenate(vis_chunks, axis=0)

    for pi, (i, j) in enumerate(pairs):
        xc = cam.pos[i]
        if j == 0:
            yl, nl, vall = y1[i].pos, y1[i].normal, y1[i].valid
            dl = jnp.zeros((r,), bool)
        else:
            yl, nl = lig.pos[j - 1], lig.normal[j - 1]
            vall, dl = lig.valid[j - 1], lig.delta[j - 1]
        ok = cam.valid[i] & vall & ~cam.delta[i] & ~dl

        d_cl, d2 = _dir_and_dist2(xc, yl)  # camera vertex -> light vertex
        cos_c = jnp.sum(cam.normal[i] * d_cl, axis=-1)
        cos_l = jnp.sum(nl * -d_cl, axis=-1)
        geom = jnp.abs(cos_c) * jnp.abs(cos_l) / d2

        # camera-junction bsdf: f, forward pdf toward the light, and the
        # reverse pdf back toward x_{t-2}
        frame_c = intersect.tangent_frame(cam.normal[i])
        win_c = _tangent(frame_c, cam.wo[i])
        wout_c = _tangent(frame_c, d_cl)
        f_c = materials.eval_bsdf(scene.materials, cam.mat_id[i], win_c, wout_c, uv=cam.uv[i])
        pdf_c_fwd = materials.pdf_bsdf(scene.materials, cam.mat_id[i], win_c, wout_c)
        pdf_c_back = materials.pdf_bsdf(scene.materials, cam.mat_id[i], wout_c, win_c)
        if i >= 1:
            to_prev, pd2 = _dir_and_dist2(xc, cam.pos[i - 1])
            rev_cam_prev = _to_area(
                pdf_c_back, jnp.sum(cam.normal[i - 1] * to_prev, axis=-1), pd2
            )
        else:
            rev_cam_prev = jnp.zeros((r,), dtype)
        rev_lig_last = _to_area(pdf_c_fwd, cos_l, d2)  # x samples y_j

        if j == 0:
            # s=1: connect to the emitter itself; one-sided cosine emission
            emit_ok = cos_l > 0.0
            beta_y1 = y1[i].emission / y1[i].pdf_area[:, None]
            contrib = cam.beta[i] * f_c * (geom * emit_ok)[:, None] * beta_y1
            rev_cam_last = _to_area(jnp.maximum(cos_l, 0.0) / jnp.pi, cos_c, d2)
            rev_lig_prev = None
        else:
            frame_l = intersect.tangent_frame(nl)
            win_l = _tangent(frame_l, lig.wo[j - 1])
            wout_l = _tangent(frame_l, -d_cl)
            f_l = materials.eval_bsdf(
                scene.materials, lig.mat_id[j - 1], win_l, wout_l,
                uv=lig.uv[j - 1],
            )
            pdf_l_fwd = materials.pdf_bsdf(
                scene.materials, lig.mat_id[j - 1], win_l, wout_l
            )
            pdf_l_back = materials.pdf_bsdf(
                scene.materials, lig.mat_id[j - 1], wout_l, win_l
            )
            contrib = cam.beta[i] * f_c * geom[:, None] * f_l * lig.beta[j - 1]
            rev_cam_last = _to_area(pdf_l_fwd, cos_c, d2)
            prev_pos_l = y0.pos if j == 1 else lig.pos[j - 2]
            prev_nrm_l = y0.normal if j == 1 else lig.normal[j - 2]
            to_prev_l, ld2 = _dir_and_dist2(yl, prev_pos_l)
            rev_lig_prev = _to_area(
                pdf_l_back, jnp.sum(prev_nrm_l * to_prev_l, axis=-1), ld2
            )

        w = _mis_weight(
            cam_chain, lig_chain, i, j,
            rev_cam_last, rev_cam_prev, rev_lig_last, rev_lig_prev,
        )
        ok = ok & vis[pi] & (jnp.max(contrib, axis=-1) > 0.0)
        radiance = radiance + jnp.where(ok[:, None], w[:, None] * contrib, 0.0)

    return radiance
