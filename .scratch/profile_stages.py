import time
import jax
import jax.numpy as jnp

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box
from libfluid_tpu.sim import binning as B, transfers as T, pressure as P
from libfluid_tpu.sim import correction as C, collisions as K, extrapolation as E
from libfluid_tpu import grids

cfg = SimConfig(grid_size=(128, 128, 128), cell_size=1.0,
                gravity=(0.0, -981.0, 0.0), particle_capacity=1 << 21,
                scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.0, 1.0, 1.0), (63.0, 63.0, 63.0))
dt = 0.02

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

bins = timeit("binning", jax.jit(lambda p, a: B.bin_particles(p, a, cfg)),
              state.position, state.active)
uvw = timeit("p2g", jax.jit(lambda p, v, c, a: T.p2g(p, v, c, a, cfg)),
             state.position, state.velocity, state.affine, state.active)
grid = state.grid._replace(u=uvw[0], v=uvw[1], w=uvw[2])
grid = timeit("mark_cells", jax.jit(lambda g, o: grids.mark_cells(g, o)), grid, bins.occupancy)
pres = timeit("pressure_solve", jax.jit(lambda g: P.solve(g, cfg, dt)), grid)
timeit("apply_pressure", jax.jit(lambda g, p: P.apply_pressure(g, p, cfg, dt)), grid, pres.pressure)
key = jax.random.PRNGKey(1)
timeit("correction", jax.jit(lambda p, a, b, k: C.correct_positions(p, a, b, cfg, dt, k)),
       state.position, state.active, bins, key)
timeit("collisions", jax.jit(lambda o, p, s: K.resolve_collisions(o, p, s, cfg)),
       state.position, state.position + 0.1, state.solid)
grid2 = timeit("extrapolation", jax.jit(lambda g: E.extrapolate(g, cfg)), grid)
timeit("g2p_pic(apic)", jax.jit(lambda g, p: T.g2p_pic(g, p, cfg)), grid2, state.position)
