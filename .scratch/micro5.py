import time
import jax, jax.numpy as jnp
from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box

NX=NY=NZ=128
F=(NX+1)*NY*NZ
cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
pos = state.position
val = jax.random.normal(jax.random.PRNGKey(1), (pos.shape[0],), jnp.float32)
OFFS = [(a,b,c) for a in (0,1) for b in (0,1) for c in (0,1)]

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:44s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

def v_clean(coords, val):  # EXACT copy of micro2 'current'
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros((F,), jnp.float32)
    den = jnp.zeros((F,), jnp.float32)
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), -1)
        flat = (idx[:, 0] * NY + idx[:, 1]) * NZ + idx[:, 2]
        flat = jnp.clip(flat, 0, F - 1)
        num = num.at[flat].add(w * val)
        den = den.at[flat].add(w)
    return num, den

def v_coords_inside(pos, val):  # compute coords inside
    coords = jnp.stack([pos[:, 0], pos[:, 1] - 0.5, pos[:, 2] - 0.5], -1)
    return v_clean(coords, val)

def v_facecoords(pos, val):  # use grids.face_index_coords
    coords = grids.face_index_coords(pos, cfg, 0)
    return v_clean(coords, val)

coords = jnp.stack([pos[:, 0], pos[:, 1] - 0.5, pos[:, 2] - 0.5], -1)
timeit("clean coords arg", v_clean, coords, val)
timeit("coords inside fn", v_coords_inside, pos, val)
timeit("grids.face_index_coords inside", v_facecoords, pos, val)
