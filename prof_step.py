"""Per-stage timing of the 128^3 APIC substep on the real chip (dev tool)."""
import time, sys
import jax, jax.numpy as jnp

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, substep
from libfluid_tpu import grids
from libfluid_tpu.sim import binning as binning_mod
from libfluid_tpu.sim import slots as slots_mod
from libfluid_tpu.sim import transfers, pressure as pressure_mod
from libfluid_tpu.sim import correction as correction_mod
from libfluid_tpu.sim import collisions as collisions_mod
from libfluid_tpu.sim import extrapolation as extrapolation_mod

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128

cfg = SimConfig(
    grid_size=(N, N, N), cell_size=1.0, gravity=(0.0, -981.0, 0.0),
    particle_capacity=1 << 21, scheme=TransferScheme.APIC, has_obstacles=False,
)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.0, 1.0, 1.0), (N / 2 - 1.0,) * 3)
dt = 0.02

# warm the state with 2 full substeps
fn = jax.jit(lambda s: substep(s, cfg, dt)[0])
state = fn(state)
state = jax.block_until_ready(fn(state))

def timeit(name, f, *args):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*args))
    t0 = time.time()
    for _ in range(5):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time() - t0) / 5 * 1e3:8.1f} ms")
    return out

state2, bins = timeit("bin+sort", lambda s: binning_mod.sort_by_cell(s, cfg), state)
slot_grid = timeit(
    "slots.build",
    lambda s, b: slots_mod.build(s.position, s.velocity, s.affine, b, cfg),
    state2, bins,
)
uvw = timeit("p2g_slots", lambda sg: transfers.p2g_slots(sg, cfg), slot_grid)
grid = state2.grid._replace(u=uvw[0], v=uvw[1], w=uvw[2])
grid = grids.mark_cells(grid, bins.occupancy)
pres = timeit("pressure.solve", lambda g: pressure_mod.solve(g, cfg, dt), grid)
timeit("apply_pressure", lambda g, p: pressure_mod.apply_pressure(g, p, cfg, dt), grid, pres.pressure)
timeit(
    "correction",
    lambda s, sg: correction_mod.correct_positions(
        s.position, s.active, sg, cfg, dt, jax.random.PRNGKey(1)
    ),
    state2, slot_grid,
)
timeit(
    "collisions",
    lambda s: collisions_mod.resolve_collisions(s.position, s.position + 0.1, s.solid, cfg),
    state2,
)
timeit("extrapolate", lambda g: extrapolation_mod.extrapolate(g, cfg), grid)
timeit("g2p_pic", lambda g, s: transfers.g2p_pic(g, s.position, cfg), grid, state2)
timeit("full substep", lambda s: substep(s, cfg, dt)[0], state)
