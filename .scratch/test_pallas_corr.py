import time
import jax, jax.numpy as jnp
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, binning as B, slots as S
from libfluid_tpu.sim import correction as C, kernels

cfg = SimConfig(grid_size=(128,128,128), particle_capacity=1<<21,
                scheme=TransferScheme.APIC, gravity=(0.,-981.,0.))
print('pallas_ok', kernels.pallas_ok(cfg), jax.default_backend(), flush=True)
state = new_state(cfg, jax.random.PRNGKey(0))
state = seed_box(state, cfg, (1.,1.,1.), (63.,63.,63.))
state, bins = jax.jit(lambda s: B.sort_by_cell(s, cfg))(state)
sg = jax.jit(lambda p,v,a,b: S.build(p,v,a,b,cfg))(state.position, state.velocity, state.affine, bins)
kc = cfg.correction_capacity
res_pos = sg.position[:, :kc]
res_mask = sg.mask[:kc]
re2 = cfg.cell_size**2 / 2.0
key = jax.random.PRNGKey(3)

f_jnp = jax.jit(lambda p, m: C._springs_jnp(p, m, re2, key, cfg))
f_pal = jax.jit(lambda p, m: kernels.correction_springs_pallas(p, m, re2, jnp.int32(7), cfg))
a = jax.block_until_ready(f_jnp(res_pos, res_mask))
b = jax.block_until_ready(f_pal(res_pos, res_mask))
print('maxdiff', float(jnp.max(jnp.abs(a-b))), 'mag', float(jnp.max(jnp.abs(a))), flush=True)

for name, f in (('jnp', f_jnp), ('pallas', f_pal)):
    t0=time.time()
    for _ in range(5): out = jax.block_until_ready(f(res_pos, res_mask))
    print(f'{name:8s} {(time.time()-t0)/5*1e3:.1f} ms', flush=True)

from libfluid_tpu.sim import kernels as KK
payload = jnp.concatenate([res_pos.reshape(24, 128,128,128), res_mask], axis=0)
f_win = jax.jit(lambda p: KK._halo_windows(p, 8, 8))
win = jax.block_until_ready(f_win(payload))
t0=time.time()
for _ in range(5): win = jax.block_until_ready(f_win(payload))
print(f'windows {(time.time()-t0)/5*1e3:.1f} ms  shape {win.shape}', flush=True)
f_unt = jax.jit(lambda w: w * 2.0)
o = jax.block_until_ready(f_unt(win))
t0=time.time()
for _ in range(5): o = jax.block_until_ready(f_unt(win))
print(f'untile {(time.time()-t0)/5*1e3:.1f} ms', flush=True)
