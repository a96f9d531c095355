import time
import jax
import jax.numpy as jnp

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box
from libfluid_tpu.sim import binning as B, transfers as T, pressure as P
from libfluid_tpu.sim import correction as C, collisions as K, extrapolation as E
from libfluid_tpu.sim import slots as S
from libfluid_tpu import grids

cfg = SimConfig(grid_size=(128, 128, 128), cell_size=1.0,
                gravity=(0.0, -981.0, 0.0), particle_capacity=1 << 21,
                scheme=TransferScheme.APIC, has_obstacles=False)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.0, 1.0, 1.0), (63.0, 63.0, 63.0))
dt = 0.02

def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

state, bins = timeit("bin+sort", lambda s: B.sort_by_cell(s, cfg), state)
sg = timeit("slot build", lambda p, v, a, b: S.build(p, v, a, b, cfg),
            state.position, state.velocity, state.affine, bins)
uvw = timeit("p2g_slots", lambda g: T.p2g_slots(g, cfg), sg)
grid = state.grid._replace(u=uvw[0], v=uvw[1], w=uvw[2])
grid = timeit("mark_cells", lambda g, o: grids.mark_cells(g, o), grid, bins.occupancy)
pres = timeit("pressure_solve", lambda g: P.solve(g, cfg, dt), grid)
timeit("apply_pressure", lambda g, p: P.apply_pressure(g, p, cfg, dt), grid, pres.pressure)
key = jax.random.PRNGKey(1)
timeit("correction", lambda p, a, g, k: C.correct_positions(p, a, g, cfg, dt, k),
       state.position, state.active, sg, key)
timeit("collisions(fast)", lambda o, p, s: K.resolve_collisions(o, p, s, cfg),
       state.position, state.position + 0.1, state.solid)
grid2 = timeit("extrapolation", lambda g: E.extrapolate(g, cfg), grid)
timeit("g2p_pic(apic)", lambda g, p: T.g2p_pic(g, p, cfg), grid2, state.position)
