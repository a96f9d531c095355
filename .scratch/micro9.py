import time
import jax, jax.numpy as jnp
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, binning as B

NX=NY=NZ=128
K=8
NC=NX*NY*NZ
cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
bins = jax.jit(lambda p,a: B.bin_particles(p,a,cfg))(state.position, state.active)
N = state.position.shape[0]

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:52s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

# (a) slot build: permute particle data to sorted order, scatter to cell*K+rank
def build_slots(pos, vel, aff, bins):
    order = bins.order
    cell_s = bins.cell_of[order]          # sorted cell ids (num_cells sentinel for inactive)
    rank = jnp.arange(N, dtype=jnp.int32) - bins.cell_start[jnp.minimum(cell_s, NC-1)]
    ok = (cell_s < NC) & (rank < K)
    slot = jnp.where(ok, cell_s * K + rank, NC * K)
    data = jnp.concatenate([pos[order], vel[order], aff[order].reshape(N, 9)], axis=1)  # (N,15)
    grid = jnp.zeros((NC * K + 1, 16), jnp.float32)
    payload = jnp.concatenate([data, jnp.ones((N,1), jnp.float32)], axis=1)
    grid = grid.at[slot].set(payload, mode="drop", indices_are_sorted=True, unique_indices=True)
    return grid[:-1].reshape(NC, K, 16)

slots = timeit("slot build (permute+scatter w16 sorted uniq)", build_slots,
               state.position, state.velocity, state.affine, bins)

# (a2) slot build narrow: pos only
def build_slots4(pos, bins):
    order = bins.order
    cell_s = bins.cell_of[order]
    rank = jnp.arange(N, dtype=jnp.int32) - bins.cell_start[jnp.minimum(cell_s, NC-1)]
    ok = (cell_s < NC) & (rank < K)
    slot = jnp.where(ok, cell_s * K + rank, NC * K)
    payload = jnp.concatenate([pos[order], jnp.ones((N,1), jnp.float32)], axis=1)
    grid = jnp.zeros((NC * K + 1, 4), jnp.float32)
    grid = grid.at[slot].set(payload, mode="drop", indices_are_sorted=True, unique_indices=True)
    return grid[:-1].reshape(NC, K, 4)
timeit("slot build narrow (w4)", build_slots4, state.position, bins)

# (b) one dense correction pass: 27 shifted offsets, fused pairwise
def correction_dense(slots):
    g = slots.reshape(NX, NY, NZ, K, 16)
    pos = g[..., :3]; mask = g[..., 15]
    re2 = 0.5
    springs = jnp.zeros((NX, NY, NZ, K, 3), jnp.float32)
    gp = jnp.pad(pos, ((1,1),(1,1),(1,1),(0,0),(0,0)))
    gm = jnp.pad(mask, ((1,1),(1,1),(1,1),(0,0)))
    for ox in (0,1,2):
        for oy in (0,1,2):
            for oz in (0,1,2):
                np_ = gp[ox:ox+NX, oy:oy+NY, oz:oz+NZ]      # (NX,NY,NZ,K,3)
                nm_ = gm[ox:ox+NX, oy:oy+NY, oz:oz+NZ]      # (NX,NY,NZ,K)
                off = pos[..., :, None, :] - np_[..., None, :, :]  # (...,K,K,3)
                sq = jnp.sum(off*off, -1)
                kern = jnp.maximum(1.0 - sq/re2, 0.0)**3
                w = kern * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
                w = jnp.where((nm_[..., None, :, None].squeeze(-1) > 0) & (sq > 1e-12), w, 0.0)
                springs = springs + jnp.sum(w[..., None] * off, axis=-2)
    return springs * mask[..., None]
timeit("correction dense 27-offset", correction_dense, slots, n=2)

# (c) p2g dense: 18 offsets x 3 axes from slots
def p2g_dense(slots):
    g = slots.reshape(NX, NY, NZ, K, 16)
    pos = g[..., :3]; vel = g[..., 3:6]; mask = g[..., 15]
    gp = jnp.pad(pos, ((1,1),(1,1),(1,1),(0,0),(0,0)))
    gv = jnp.pad(vel, ((1,1),(1,1),(1,1),(0,0),(0,0)))
    gm = jnp.pad(mask, ((1,1),(1,1),(1,1),(0,0)))
    outs = []
    for axis in range(3):
        fshape = [NX, NY, NZ]; fshape[axis] += 1
        num = jnp.zeros(fshape, jnp.float32); den = jnp.zeros(fshape, jnp.float32)
        # face f receives from cells f - off, off in 18 offsets
        ranges = [(-1,0,1)]*3; ranges[axis] = (-1, 0)
        for ox in ranges[0]:
            for oy in ranges[1]:
                for oz in ranges[2]:
                    # neighbor cell c = f + (ox,oy,oz) in cell coords; read cells shifted
                    sl = [slice(1+o, 1+o+s) for o, s in zip((ox,oy,oz), (NX,NY,NZ))]
                    np_ = gp[tuple(sl)]; nv_ = gv[tuple(sl)]; nm_ = gm[tuple(sl)]
                    # face world coordinate per cell... approximate weight calc:
                    fc = np_  # placeholder arithmetic of same cost
                    w = jnp.maximum(1.0 - jnp.abs(fc[..., 0]), 0.0) * \
                        jnp.maximum(1.0 - jnp.abs(fc[..., 1]), 0.0) * \
                        jnp.maximum(1.0 - jnp.abs(fc[..., 2]), 0.0) * nm_
                    contrib_n = jnp.sum(w * nv_[..., axis], axis=-1)
                    contrib_d = jnp.sum(w, axis=-1)
                    pad_out = [(0,0)]*3; pad_out[axis] = (0,1)
                    num = num + jnp.pad(contrib_n, pad_out)
                    den = den + jnp.pad(contrib_d, pad_out)
        outs.append(num / jnp.maximum(den, 1e-6))
    return outs
timeit("p2g dense 18-offset x3 (approx cost)", p2g_dense, slots, n=2)
