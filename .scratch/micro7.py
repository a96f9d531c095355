import time
import jax, jax.numpy as jnp
from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, binning as B

NX=NY=NZ=128
cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
bins = jax.jit(lambda p,a: B.bin_particles(p,a,cfg))(state.position, state.active)
pos_sorted = state.position[bins.order]
act_sorted = state.active[bins.order]
pos = state.position
val = jax.random.normal(jax.random.PRNGKey(1), (pos.shape[0],), jnp.float32)
OFFS = [(a,b,c) for a in (0,1) for b in (0,1) for c in (0,1)]

AXIS=0
SHAPE=[NX+1,NY,NZ]
FT=SHAPE[0]*SHAPE[1]*SHAPE[2]

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:52s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

def facecoords(p):
    return jnp.stack([p[:,0], p[:,1]-0.5, p[:,2]-0.5], -1)

def scatter8(p, v, sorted_flag=False, unique=False):
    coords = facecoords(p)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros((FT,), jnp.float32)
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0-frac), -1)
        flat = (idx[:,0]*SHAPE[1] + idx[:,1])*SHAPE[2] + idx[:,2]
        flat = jnp.clip(flat, 0, FT-1)
        num = num.at[flat].add(w*v, indices_are_sorted=sorted_flag, unique_indices=unique)
    return num

def scatter_one_big(p, v):
    # one scatter with 16M updates
    coords = facecoords(p)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    flats, ws = [], []
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0-frac), -1)
        flat = (idx[:,0]*SHAPE[1] + idx[:,1])*SHAPE[2] + idx[:,2]
        flats.append(jnp.clip(flat, 0, FT-1)); ws.append(w*v)
    flat = jnp.concatenate(flats); wv = jnp.concatenate(ws)
    return jnp.zeros((FT,), jnp.float32).at[flat].add(wv)

def segsum8(p, v, sorted_flag=True):
    # segment-sum by sorted base index per offset
    coords = facecoords(p)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros((FT,), jnp.float32)
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0-frac), -1)
        flat = (idx[:,0]*SHAPE[1] + idx[:,1])*SHAPE[2] + idx[:,2]
        flat = jnp.clip(flat, 0, FT-1)
        num = num + jax.ops.segment_sum(w*v, flat, num_segments=FT,
                                        indices_are_sorted=sorted_flag)
    return num

def bincount8(p, v):
    coords = facecoords(p)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros((FT,), jnp.float32)
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0-frac), -1)
        flat = (idx[:,0]*SHAPE[1] + idx[:,1])*SHAPE[2] + idx[:,2]
        flat = jnp.clip(flat, 0, FT-1)
        num = num + jnp.bincount(flat, weights=w*v, length=FT)
    return num

r0 = timeit("scatter8 unsorted pos", scatter8, pos, val)
r1 = timeit("scatter8 sorted pos (no flag)", scatter8, pos_sorted, val)
r2 = timeit("scatter8 sorted pos + indices_are_sorted", lambda p,v: scatter8(p,v,True), pos_sorted, val)
r3 = timeit("one big 16M scatter, unsorted", scatter_one_big, pos, val)
r4 = timeit("segment_sum x8 sorted flag", segsum8, pos_sorted, val)
r5 = timeit("bincount x8", bincount8, pos_sorted, val)
print("check sorted-flag correctness:", float(jnp.max(jnp.abs(r1-r2))), float(jnp.max(jnp.abs(r1-r4))))
