import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = NY = 32
NZ = 128
C = 24
SX = SY = 8

def kernel(seed_ref, pos_ref, out_ref, pos_s, sems):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        pos_ref.at[:, pl.ds(i * SX, SX + 2), pl.ds(j * SY, SY + 2), :],
        pos_s, sems.at[0])
    cp.start(); cp.wait()
    out_ref[:] = pos_s[:, 1:1+SX, 1:1+SY, :] * 2.0

pos = jax.random.normal(jax.random.PRNGKey(0), (C, NX, NY, NZ), jnp.float32)
pos_p = jnp.pad(pos, ((0,0),(1,1),(1,1),(0,0)))
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(NX // SX, NY // SY),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((C, SX, SY, NZ), lambda i, j, *_: (0, i, j, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((C, SX + 2, SY + 2, NZ), jnp.float32),
        pltpu.SemaphoreType.DMA((1,)),
    ],
)
out = pl.pallas_call(kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((C, NX, NY, NZ), jnp.float32),
)(jnp.asarray([3], jnp.int32), pos_p)
out = jax.block_until_ready(out)
print("4d dma maxdiff", float(jnp.max(jnp.abs(out - pos * 2.0))), flush=True)
