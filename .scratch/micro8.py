import time
import jax, jax.numpy as jnp
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, binning as B

NX=NY=NZ=128
cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
bins = jax.jit(lambda p,a: B.bin_particles(p,a,cfg))(state.position, state.active)
pos = state.position
pos_sorted = pos[bins.order]
N = pos.shape[0]
AXIS=0
SHAPE=[NX+1,NY,NZ]
FT=SHAPE[0]*SHAPE[1]*SHAPE[2]

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:52s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

def rowscatter(width, sorted_flag=False):
    def fn(p):
        coords = jnp.stack([p[:,0], p[:,1]-0.5, p[:,2]-0.5], -1)
        base = jnp.floor(coords).astype(jnp.int32)
        frac = coords - base
        flat = (base[:,0]*SHAPE[1] + base[:,1])*SHAPE[2] + base[:,2]
        flat = jnp.clip(flat, 0, FT-1)
        rows = jnp.repeat(frac, (width+2)//3, axis=1)[:, :width]
        out = jnp.zeros((FT, width), jnp.float32)
        return out.at[flat].add(rows, indices_are_sorted=sorted_flag)
    return fn

for w in (1, 8, 16, 40, 48):
    timeit(f"row scatter width={w} unsorted", rowscatter(w), pos)
timeit("row scatter width=40 sorted-order", rowscatter(40), pos_sorted)
timeit("row scatter width=40 sorted+flag", rowscatter(40, True), pos_sorted)

# combine cost estimate: 8 shifts x 8 moments FMA on (129,128,128)
def combine(mgrid):
    out = jnp.zeros((FT,), jnp.float32)
    g = mgrid.reshape(SHAPE[0], SHAPE[1], SHAPE[2], -1)
    gp = jnp.pad(g, ((1,0),(1,0),(1,0),(0,0)))
    for o in [(a,b,c) for a in (0,1) for b in (0,1) for c in (0,1)]:
        sl = gp[1-o[0]:SHAPE[0]+1-o[0], 1-o[1]:SHAPE[1]+1-o[1], 1-o[2]:SHAPE[2]+1-o[2]]
        out = out + jnp.sum(sl * jnp.arange(1, g.shape[-1]+1, dtype=jnp.float32), -1).reshape(-1)
    return out
m = jax.jit(rowscatter(8))(pos)
timeit("combine 8 shifts x 8 moments", combine, m)
