import jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, binning as B, slots as S
from libfluid_tpu.sim import correction as C, kernels
from jax.experimental import pallas as pl
import functools

cfg = SimConfig(grid_size=(16,16,128), particle_capacity=1<<16,
                scheme=TransferScheme.APIC)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (0.5,0.5,0.5), (14.,14.,20.))
state, bins = B.sort_by_cell(state, cfg)
sg = S.build(state.position, state.velocity, state.affine, bins, cfg)
kc = cfg.correction_capacity
res_pos = sg.position[:, :kc]; res_mask = sg.mask[:kc]
re2 = 0.5
key = jax.random.PRNGKey(3)
a = C._springs_jnp(res_pos, res_mask, re2, key, cfg)

import unittest.mock as mock
orig = pl.pallas_call
with mock.patch.object(pl, 'pallas_call', functools.partial(orig, interpret=True)):
    b = kernels.correction_springs_pallas(res_pos, res_mask, re2, jnp.int32(7), cfg)
# coincident pairs ~0 in seeded data (jitter differs) so compare directly
print('interp maxdiff', float(jnp.max(jnp.abs(a-b))), 'mag', float(jnp.max(jnp.abs(a))))
