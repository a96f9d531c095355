import time
import jax, jax.numpy as jnp
from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box

cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
_OFFSETS = [(dx,dy,dz) for dx in (0,1) for dy in (0,1) for dz in (0,1)]

def axis_fn(position, value, active, mask_mode):
    axis = 0
    nx, ny, nz = cfg.grid_size
    shape = [nx+1, ny, nz]
    dims = jnp.asarray(shape, jnp.int32)
    coords = grids.face_index_coords(position, cfg, axis)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros(tuple(shape), jnp.float32).reshape(-1)
    den = jnp.zeros_like(num)
    for off in _OFFSETS:
        offv = jnp.asarray(off, jnp.int32)
        idx = base + offv
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0-frac), axis=-1)
        if mask_mode == "full":
            inb = jnp.all((idx >= 0) & (idx < dims), axis=-1) & active
            w = jnp.where(inb, w, 0.0)
        elif mask_mode == "active":
            w = jnp.where(active, w, 0.0)
        flat = (idx[...,0]*shape[1] + idx[...,1])*shape[2] + idx[...,2]
        flat = jnp.clip(flat, 0, num.shape[0]-1)
        num = num.at[flat].add(w*value)
        den = den.at[flat].add(w)
    face = jnp.where(den > 1e-6, num/jnp.maximum(den,1e-6), 0.)
    return face.reshape(tuple(shape))

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:40s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

timeit("axis0 mask=none", lambda p,v,a: axis_fn(p,v,a,"none"), state.position, state.velocity[:,0], state.active)
timeit("axis0 mask=active", lambda p,v,a: axis_fn(p,v,a,"active"), state.position, state.velocity[:,0], state.active)
timeit("axis0 mask=full", lambda p,v,a: axis_fn(p,v,a,"full"), state.position, state.velocity[:,0], state.active)
