"""Pallas TPU kernels for the neighborhood-heavy simulation passes.

The dense slot-grid passes (:mod:`libfluid_tpu.sim.slots` consumers) are
HBM-bound under XLA: every one of the 27 neighbor offsets re-streams the slot
payload from HBM. These kernels tile the grid over (x, y), keep a halo'd slot
slab resident in VMEM, and run all offsets against it — the payload is read
from HBM once instead of 27 times, and the pairwise math runs at VPU speed.

Halo handling: overlapping input windows are not expressible with BlockSpec
index maps, and >3D strided manual DMA faults the chip — so the halo'd tile
windows are materialized by XLA *outside* the kernel (`_halo_windows`, a
handful of static slices, ~1.5x the payload bytes once) and the kernel runs
on a 1D grid of window blocks with Mosaic's automatic double-buffered
pipeline.

Layout contract (from :mod:`slots`): arrays are (C, K, nx, ny, nz) with z
minor — z maps onto the 128 vector lanes, so z-neighbor shifts are lane rolls
(``pltpu.roll``) with edge masking, and x/y halos come from the windows.

The kernels are forward-only; gradients fall back to the pure-jnp
implementations via ``jax.custom_vjp`` (the jnp versions are the semantic
oracle — bit-compatible up to reduction order — and are the CPU/test path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libfluid_tpu.config import SimConfig
from libfluid_tpu.sim import slots as slots_mod


def pallas_ok(cfg: SimConfig) -> bool:
    """Static dispatch: the Pallas path needs a TPU backend, f32, and grid
    dims divisible by the tile size."""
    nx, ny, nz = cfg.grid_size
    return (
        jax.default_backend() == "tpu"
        and cfg.dtype == jnp.float32
        and nx % 8 == 0
        and ny % 8 == 0
        and nz % 128 == 0
    )


def _halo_windows(arr: jnp.ndarray, sx: int, sy: int) -> jnp.ndarray:
    """(C, nx, ny, nz) -> (C, gx, sx+2, gy, sy+2, nz) halo'd tile windows.

    Built from six strided slices (core reshape + one-cell halo planes per
    axis) with NO transposes — the tile dims stay interleaved with the
    in-tile dims, which keeps this a pure reshape/concat pipeline (~1.5x the
    payload bytes); the kernel's BlockSpec picks (i, j) tiles from dims 1/3.
    """
    c, nx, ny, nz = arr.shape
    gx, gy = nx // sx, ny // sy
    p = jnp.pad(arr, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # stage 1: split x into (gx, sx+2) windows: (c, gx, sx+2, ny+2, nz)
    wx = jnp.concatenate(
        [
            p[:, 0:nx:sx][:, :, None],  # left halo: x = i*sx - 1
            p[:, 1 : 1 + nx].reshape(c, gx, sx, ny + 2, nz),
            p[:, sx + 1 :: sx][:, :, None],  # right halo: x = (i+1)*sx
        ],
        axis=2,
    )
    # stage 2: split y likewise: (c, gx, sx+2, gy, sy+2, nz)
    return jnp.concatenate(
        [
            wx[:, :, :, 0:ny:sy][:, :, :, :, None],
            wx[:, :, :, 1 : 1 + ny].reshape(c, gx, sx + 2, gy, sy, nz),
            wx[:, :, :, sy + 1 :: sy][:, :, :, :, None],
        ],
        axis=4,
    )


def _untile(arr: jnp.ndarray, gx: int, gy: int) -> jnp.ndarray:
    """(T, C, sx, sy, nz) -> (C, nx, ny, nz)."""
    t, c, sx, sy, nz = arr.shape
    return (
        arr.reshape(gx, gy, c, sx, sy, nz)
        .transpose(2, 0, 3, 1, 4, 5)
        .reshape(c, gx * sx, gy * sy, nz)
    )


def _roll_z(arr: jnp.ndarray, dz: int, zmask_cache: dict) -> jnp.ndarray:
    """Shift along the minor z axis by dz with zero fill at the domain edge
    (a lane roll + edge mask; z is the 128-lane dim)."""
    if dz == 0:
        return arr
    nz = arr.shape[-1]
    rolled = pltpu.roll(arr, (-dz) % nz, axis=arr.ndim - 1)
    key = (dz, arr.ndim)
    if key not in zmask_cache:
        zi = jax.lax.broadcasted_iota(
            jnp.int32, (1,) * (arr.ndim - 1) + (nz,), arr.ndim - 1
        )
        zmask_cache[key] = ((zi + dz >= 0) & (zi + dz < nz)).astype(arr.dtype)
    return rolled * zmask_cache[key]


# ---------------------------------------------------------------------------
# P2G: particle-to-grid momentum transfer
# ---------------------------------------------------------------------------


def _roll_axis(arr: jnp.ndarray, d: int, axis: int, cache: dict) -> jnp.ndarray:
    """Entry i holds arr[i - d] along `axis` (negative axis index), zero fill
    at the edges — the in-VMEM equivalent of ``slots.shifted`` for one dim."""
    if d == 0:
        return arr
    n = arr.shape[axis]
    rolled = pltpu.roll(arr, d % n, axis=arr.ndim + axis)
    key = (d, axis, arr.ndim)
    if key not in cache:
        shape = [1] * arr.ndim
        shape[axis] = n
        zi = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), arr.ndim + axis)
        cache[key] = ((zi - d >= 0) & (zi - d < n)).astype(arr.dtype)
    return rolled * cache[key]


def _p2g_kernel(
    occ_ref,  # scalar prefetch (gx,) int32 — plane (or halo) holds particles
    left_ref,  # VMEM (16K, 1, ny, nz) payload plane x = i-1 (clamped)
    ctr_ref,  # VMEM (16K, 1, ny, nz) payload plane x = i
    right_ref,  # VMEM (16K, 1, ny, nz) payload plane x = i+1 (clamped)
    un_ref,  # VMEM out (1, ny, nz) — lo-face accumulators of the plane's cells
    vn_ref,
    wn_ref,
    ud_ref,
    vd_ref,
    wd_ref,
    *,
    k: int,
    h: float,
    offset: tuple,
    use_affine: bool,
):
    """All P2G contributions to the LO faces of one x-plane of cells.

    Face f (cell-indexed: the lo face of cell c along `axis`) accumulates the
    kernel-weighted momentum of cells b = c - d for the 18 offsets d in its
    staggered support (d_axis in {0,1}, others {-1,0,1}) — the same sum as
    the jnp oracle (``transfers.p2g_slots``, ref ``simulation.cpp:293-412``).

    Tiling: grid over x-planes with three clamped-index block inputs (left /
    center / right plane). The x halo therefore costs 3x streaming reads of
    the payload but ZERO materialized halo windows (the round-1
    ``_halo_windows`` copy cost more than the whole jnp pass); y and z halos
    are in-VMEM lane rolls.
    """
    i = pl.program_id(0)
    nplanes = pl.num_programs(0)

    @pl.when(occ_ref[i] == 0)
    def _():
        for ref in (un_ref, vn_ref, wn_ref, ud_ref, vd_ref, wd_ref):
            ref[:] = jnp.zeros_like(ref)

    @pl.when(occ_ref[i] > 0)
    def _():
        ny, nz = ctr_ref.shape[-2], ctr_ref.shape[-1]
        # x-block validity: at the domain edge the clamped neighbor block is
        # a duplicate and must contribute nothing (no cells beyond the wall)
        lvalid = (i > 0).astype(jnp.float32)
        rvalid = (i < nplanes - 1).astype(jnp.float32)

        inv_h = 1.0 / h
        shape3 = (1, ny, nz)
        cyf = jax.lax.broadcasted_iota(jnp.int32, shape3, 1).astype(jnp.float32)
        czf = jax.lax.broadcasted_iota(jnp.int32, shape3, 2).astype(jnp.float32)
        cxf = jnp.full(shape3, 0.0) + i.astype(jnp.float32)
        cf = [cxf, cyf, czf]

        def prep(ref, xvalid):
            """Block -> (gpos[3], mask, vel[3], aff[3][3]) in grid units."""
            win = ref[:, 0]  # (16K, ny, nz)
            pos = win[: 3 * k].reshape(3, k, ny, nz)
            gpos = [(pos[d] - offset[d]) * inv_h for d in range(3)]
            mask = win[3 * k : 4 * k] * xvalid
            vel = win[4 * k : 7 * k].reshape(3, k, ny, nz)
            aff = (
                win[7 * k : 16 * k].reshape(3, 3, k, ny, nz)
                if use_affine
                else None
            )
            return gpos, mask, vel, aff

        # contribution offset d reads cell b = c - d: d_x = +1 -> LEFT plane
        blocks = {
            1: prep(left_ref, lvalid),
            0: prep(ctr_ref, 1.0),
            -1: prep(right_ref, rvalid),
        }

        num = [jnp.zeros(shape3[1:], jnp.float32) for _ in range(3)]
        den = [jnp.zeros(shape3[1:], jnp.float32) for _ in range(3)]
        cache: dict = {}

        for dx in (-1, 0, 1):
            gpos0, mask0, vel0, aff0 = blocks[dx]
            for dy in (-1, 0, 1):
                # roll y once, reuse across dz and all consumers
                def ry(a):
                    return _roll_axis(a, dy, -2, cache)

                gpos_y = [ry(g) for g in gpos0]
                mask_y = ry(mask0)
                vel_y = None
                aff_y = None
                for dz in (-1, 0, 1):
                    d = (dx, dy, dz)
                    axes = [a for a in range(3) if d[a] != -1]
                    if not axes:
                        continue
                    if vel_y is None:
                        vel_y = [ry(v) for v in vel0]
                        if use_affine:
                            aff_y = [[ry(aff0[a, j]) for j in range(3)] for a in range(3)]

                    def rz(a):
                        return _roll_axis(a, dz, -1, cache)

                    mask_b = rz(mask_y)
                    gpos_b = [rz(g) for g in gpos_y]
                    hat0 = {}
                    hat05 = {}
                    for dim in range(3):
                        t = gpos_b[dim] - cf[dim]
                        if dim in axes:
                            hat0[dim] = jnp.maximum(1.0 - jnp.abs(t), 0.0)
                        hat05[dim] = jnp.maximum(1.0 - jnp.abs(t - 0.5), 0.0)
                    for a in axes:
                        w = mask_b
                        for dim in range(3):
                            w = w * (hat0[dim] if dim == a else hat05[dim])
                        val = rz(vel_y[a])
                        if use_affine:
                            # + A_row . (x_face - x_p), in grid units * h
                            for jdim in range(3):
                                shift = 0.0 if jdim == a else 0.5
                                dxj = (cf[jdim] + shift - gpos_b[jdim]) * h
                                val = val + rz(aff_y[a][jdim]) * dxj
                        num[a] = num[a] + jnp.sum(w * val, axis=0)
                        den[a] = den[a] + jnp.sum(w, axis=0)

        for a, (nref, dref) in enumerate(
            zip((un_ref, vn_ref, wn_ref), (ud_ref, vd_ref, wd_ref))
        ):
            nref[0] = num[a]
            dref[0] = den[a]


def plane_occupancy(mask: jnp.ndarray, halo: int = 1) -> jnp.ndarray:
    """(K, nx, ny, nz) slot mask -> (nx,) int32: does x-plane i (or its halo
    neighbors) hold any particle?"""
    per_plane = jnp.sum(mask, axis=(0, 2, 3))  # (nx,)
    nx = per_plane.shape[0]
    p = jnp.pad(per_plane, (halo, halo))
    acc = jnp.zeros((nx,), per_plane.dtype)
    for d in range(2 * halo + 1):
        acc = acc + p[d : d + nx]
    return (acc > 0).astype(jnp.int32)


def p2g_lo_faces_pallas(
    data: jnp.ndarray,  # (16, K, nx, ny, nz) slot payload
    cfg: SimConfig,
    use_affine: bool,
):
    """UNNORMALIZED lo-face accumulators: (num_u, num_v, num_w, den_u,
    den_v, den_w), each (nx, ny, nz). The caller merges overflow particles
    and normalizes.

    The hi boundary planes (faces x=nx, y=ny, z=nz) are NOT computed here —
    the caller assembles them (they only see cells on the far boundary slab,
    a cheap jnp pass)."""
    width, k, nx, ny, nz = data.shape

    payload = data.reshape(width * k, nx, ny, nz)
    occ = plane_occupancy(data[slots_mod.COL_MASK])

    def xblock(dx):
        return pl.BlockSpec(
            (width * k, 1, ny, nz),
            lambda i, *_: (0, jnp.clip(i + dx, 0, nx - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nx,),
        in_specs=[xblock(-1), xblock(0), xblock(1)],
        out_specs=[
            pl.BlockSpec(
                (1, ny, nz),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 6,
    )
    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32)] * 6
    return pl.pallas_call(
        functools.partial(
            _p2g_kernel,
            k=k,
            h=float(cfg.cell_size),
            offset=tuple(float(o) for o in cfg.grid_offset),
            use_affine=use_affine,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(occ, payload, payload, payload)


# ---------------------------------------------------------------------------
# Position-correction springs
# ---------------------------------------------------------------------------


def _correction_kernel(
    seed_ref,  # scalar prefetch (1,) int32
    occ_ref,  # scalar prefetch (gx, gy) int32 — per-tile particle presence
    win_ref,  # VMEM (3*KC+KC, 1, SX+2, 1, SY+2, nz) pos rows then mask rows
    springs_ref,  # VMEM out (3*KC, SX, SY, nz) — disjoint tile of the output
    *,
    kc: int,
    sx: int,
    sy: int,
    re2: float,
    with_jitter: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(occ_ref[i, j] == 0)
    def _():
        springs_ref[:] = jnp.zeros_like(springs_ref)

    @pl.when(occ_ref[i, j] > 0)
    def _():
        if with_jitter:
            pltpu.prng_seed(seed_ref[0] + 362437 * i + 7368787 * j)
        win = win_ref[:, 0, :, 0]  # (4*KC, SX+2, SY+2, nz)
        nz = win.shape[-1]
        pos_s = win[: 3 * kc].reshape(3, kc, sx + 2, sy + 2, nz)
        mask_s = win[3 * kc :]  # (KC, SX+2, SY+2, nz)

        res_pos = pos_s[:, :, 1 : 1 + sx, 1 : 1 + sy, :]  # (3, KC, SX, SY, nz)
        res_mask = mask_s[:, 1 : 1 + sx, 1 : 1 + sy, :]  # (KC, SX, SY, nz)

        wsum = jnp.zeros((kc, sx, sy, nz), jnp.float32)
        wnbr = [jnp.zeros_like(wsum) for _ in range(3)]
        coin = jnp.zeros_like(wsum)
        zmask_cache: dict = {}

        for dx, dy, dz in slots_mod.NEIGHBOR_OFFSETS:
            nb_pos = pos_s[:, :, 1 + dx : 1 + dx + sx, 1 + dy : 1 + dy + sy, :]
            nb_mask = mask_s[:, 1 + dx : 1 + dx + sx, 1 + dy : 1 + dy + sy, :]
            nb_pos = _roll_z(nb_pos, dz, zmask_cache)
            nb_mask = _roll_z(nb_mask, dz, zmask_cache)
            # pairwise (KC res, KC nbr, SX, SY, nz)
            sq = sum(
                (res_pos[c][:, None] - nb_pos[c][None, :]) ** 2 for c in range(3)
            )
            pair = res_mask[:, None] * nb_mask[None, :]
            if (dx, dy, dz) == (0, 0, 0):
                # exclude self-pairs; broadcasted_iota (not reshape of eye) —
                # Mosaic can't reshape across the tiled dims
                ri = jax.lax.broadcasted_iota(jnp.int32, (kc, kc, 1, 1, 1), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (kc, kc, 1, 1, 1), 1)
                pair = pair * (ri != ci).astype(jnp.float32)
            degenerate = sq < 1e-12
            kern = jnp.maximum(1.0 - sq * (1.0 / re2), 0.0) ** 3
            w = kern * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
            w = jnp.where(degenerate, 0.0, w) * pair
            wsum = wsum + jnp.sum(w, axis=1)
            for c in range(3):
                wnbr[c] = wnbr[c] + jnp.sum(w * nb_pos[c][None, :], axis=1)
            coin = coin + jnp.sum(jnp.where(degenerate, pair, 0.0), axis=1)

        if with_jitter:
            bits = pltpu.prng_random_bits((3, kc, sx, sy, nz))
            # int32 bits are uniform over [-2^31, 2^31): scale to [-1, 1)
            jitter = (
                pltpu.bitcast(bits, jnp.int32).astype(jnp.float32)
                * (1.0 / 2147483648.0)
            )
        for c in range(3):
            out = res_pos[c] * wsum - wnbr[c]
            if with_jitter:
                out = out + coin * jitter[c]
            springs_ref[c * kc : (c + 1) * kc] = out


def tile_occupancy(mask: jnp.ndarray, sx: int, sy: int, halo: int = 1) -> jnp.ndarray:
    """(K, nx, ny, nz) slot mask -> (gx, gy) int32 flags: does tile (i, j)
    (or its halo ring) hold any particle?"""
    k, nx, ny, nz = mask.shape
    gx, gy = nx // sx, ny // sy
    any_part = (
        jnp.sum(mask, axis=(0, 3)).reshape(gx, sx, gy, sy).sum(axis=(1, 3))
    )  # (gx, gy)
    p = jnp.pad(any_part, ((halo, halo), (halo, halo)))
    acc = jnp.zeros((gx, gy), any_part.dtype)
    for dx in range(2 * halo + 1):
        for dy in range(2 * halo + 1):
            acc = acc + p[dx : dx + gx, dy : dy + gy]
    return (acc > 0).astype(jnp.int32)


def correction_springs_pallas(
    res_pos: jnp.ndarray,  # (3, KC, nx, ny, nz)
    res_mask: jnp.ndarray,  # (KC, nx, ny, nz)
    re2,
    seed: jnp.ndarray,  # () int32
    cfg: SimConfig,
    with_jitter: bool = True,
) -> jnp.ndarray:
    """Per-slot correction springs incl. coincident-pair jitter, as one
    VMEM-resident pass over the 27 offsets. Returns (3, KC, nx, ny, nz)."""
    kc = res_pos.shape[1]
    nx, ny, nz = cfg.grid_size
    sx, sy = 8, 8
    gx, gy = nx // sx, ny // sy

    payload = jnp.concatenate(
        [res_pos.reshape(3 * kc, nx, ny, nz), res_mask], axis=0
    )
    win = _halo_windows(payload, sx, sy)  # (4KC, gx, SX+2, gy, SY+2, nz)
    occ = tile_occupancy(res_mask, sx, sy)

    # the output is the untiled springs array directly — tiles are disjoint,
    # only the INPUT needs halo windows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gx, gy),
        in_specs=[
            pl.BlockSpec(
                (4 * kc, 1, sx + 2, 1, sy + 2, nz),
                lambda i, j, *_: (0, i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3 * kc, sx, sy, nz),
            lambda i, j, *_: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    springs = pl.pallas_call(
        functools.partial(
            _correction_kernel,
            kc=kc,
            sx=sx,
            sy=sy,
            re2=float(re2),
            with_jitter=with_jitter,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3 * kc, nx, ny, nz), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.asarray([seed], jnp.int32), occ, win)
    return springs.reshape(3, kc, nx, ny, nz)
