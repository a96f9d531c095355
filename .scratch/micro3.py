import time
import jax, jax.numpy as jnp
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box
from libfluid_tpu.sim import transfers as T

cfg = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.APIC)
cfg_pic = SimConfig(grid_size=(128,128,128), gravity=(0.,-981.,0.),
                particle_capacity=1<<21, scheme=TransferScheme.PIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0=time.time()
    for _ in range(n): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:40s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

timeit("p2g apic (real)", lambda p,v,c,a: T.p2g(p,v,c,a,cfg),
       state.position, state.velocity, state.affine, state.active)
timeit("p2g pic (real, no affine)", lambda p,v,c,a: T.p2g(p,v,c,a,cfg_pic),
       state.position, state.velocity, state.affine, state.active)
timeit("p2g axis0 apic", lambda p,v,c,a: T._p2g_axis(p, v[:,0], c[:,0,:], a, cfg, 0),
       state.position, state.velocity, state.affine, state.active)
timeit("p2g axis0 noaffine", lambda p,v,a: T._p2g_axis(p, v[:,0], None, a, cfg, 0),
       state.position, state.velocity, state.active)
grid = new_state(cfg, jax.random.PRNGKey(1)).grid
timeit("g2p new (real)", lambda g,p: T.g2p_pic(g,p,cfg), grid, state.position)
from libfluid_tpu.sim import binning as B
timeit("binning new", lambda p,a: B.bin_particles(p,a,cfg), state.position, state.active)
