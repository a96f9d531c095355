"""G2P component timing at 128^3."""
import sys
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo/benchmarks")
from timing import timeit

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, substep, binning as binning_mod
from libfluid_tpu.sim import transfers
from libfluid_tpu import grids

cfg = SimConfig(grid_size=(128,)*3, gravity=(0.,-981.,0.), particle_capacity=1<<21,
                scheme=TransferScheme.APIC, has_obstacles=False)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,)*3)
state = jax.jit(lambda s: substep(s, cfg, 0.02)[0])(state)
state, bins = jax.jit(lambda s: binning_mod.sort_by_cell(s, cfg))(state)
grid = state.grid

def t(name, f, *a):
    wall, out = timeit(jax.jit(f), *a)
    print(f"{name:42s} {wall*1e3:8.2f} ms", flush=True)
    return out

def table_only(g):
    tables = [transfers._stacked_shifts(arr, transfers._cell_offsets(a), a)
              for a, arr in enumerate((g.u, g.v, g.w))]
    num_cells = tables[0].shape[1]
    tab = jnp.concatenate(tables + [jnp.zeros((10, num_cells), jnp.float32)], 0)
    return transfers._transpose_major(tab)
tbl = t("table build + transpose", table_only, grid)

cell3 = grids.cell_index_of(state.position, cfg)
dims = jnp.asarray(cfg.grid_size, jnp.int32)
cell_flat = grids.flat_cell_index(jnp.clip(cell3, 0, dims - 1), cfg)
t("row gather (N,64) sorted", lambda tb, i: tb[i], tbl, cell_flat)
t("g2p full", lambda g, p: transfers.g2p_pic(g, p, cfg), grid, state.position)
