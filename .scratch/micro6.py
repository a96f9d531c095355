import time
import jax, jax.numpy as jnp
from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box
from libfluid_tpu.sim import transfers as T

NX=NY=NZ=128
cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
pos, vel, aff, act = state.position, state.velocity, state.affine, state.active
OFFS = [(a,b,c) for a in (0,1) for b in (0,1) for c in (0,1)]

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:44s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

AXIS=0
SHAPE=[NX,NY,NZ]; SHAPE[AXIS]+=1
FT=SHAPE[0]*SHAPE[1]*SHAPE[2]
dims = jnp.asarray(SHAPE, jnp.int32)

def variant(mask=False, drop=False, affine=False, norm=False, facecoords=False):
    def fn(pos, vel, aff, act):
        value = vel[:, AXIS]
        if facecoords:
            coords = grids.face_index_coords(pos, cfg, AXIS)
        else:
            coords = jnp.stack([pos[:,0], pos[:,1]-0.5, pos[:,2]-0.5], -1)
        base = jnp.floor(coords).astype(jnp.int32)
        frac = coords - base
        num = jnp.zeros((FT,), jnp.float32)
        den = jnp.zeros((FT,), jnp.float32)
        wb = jnp.asarray(cfg.grid_offset, jnp.float32) + T._face_world_shift(cfg, AXIS)
        for off in OFFS:
            offv = jnp.asarray(off, jnp.int32)
            idx = base + offv
            w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0-frac), -1)
            if mask:
                inb = jnp.all((idx >= 0) & (idx < dims), -1) & act
                w = jnp.where(inb, w, 0.0)
            if affine:
                fp = wb + idx.astype(jnp.float32) * cfg.cell_size
                val = value + jnp.sum(aff[:, AXIS, :] * (fp - pos), -1)
            else:
                val = value
            flat = (idx[:,0]*SHAPE[1] + idx[:,1])*SHAPE[2] + idx[:,2]
            if drop:
                flat = jnp.where(inb, flat, FT)
                num = num.at[flat].add(w*val, mode="drop")
                den = den.at[flat].add(w, mode="drop")
            else:
                flat = jnp.clip(flat, 0, FT-1)
                num = num.at[flat].add(w*val)
                den = den.at[flat].add(w)
        if norm:
            return jnp.where(den > 1e-6, num/jnp.maximum(den,1e-6), 0.0)
        return num, den
    return fn

timeit("bare (clip, no mask)", variant(), pos, vel, aff, act)
timeit("+mask (clip)", variant(mask=True), pos, vel, aff, act)
timeit("+mask +drop", variant(mask=True, drop=True), pos, vel, aff, act)
timeit("+mask +drop +affine", variant(mask=True, drop=True, affine=True), pos, vel, aff, act)
timeit("+mask +drop +affine +norm", variant(mask=True, drop=True, affine=True, norm=True), pos, vel, aff, act)
timeit("+all +facecoords", variant(True, True, True, True, True), pos, vel, aff, act)
timeit("real _p2g_axis", lambda p,v,a,ac: T._p2g_axis(p, v[:,AXIS], a[:,AXIS,:], ac, cfg, AXIS), pos, vel, aff, act)
