import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1) plain VMEM kernel
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0
x = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32)
o = pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
print("basic", float(jnp.max(jnp.abs(o - 2*x))), flush=True)

# 2) manual DMA HBM->VMEM, 2D
def k2(x_ref, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 256), :], scratch, sem)
    cp.start(); cp.wait()
    o_ref[:] = scratch[:] * 2.0
o2 = pl.pallas_call(k2, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((256,256), jnp.float32),
                                    pltpu.SemaphoreType.DMA(())])(x)
print("dma2d", float(jnp.max(jnp.abs(o2 - 2*x))), flush=True)

# 3) grid + dynamic ds DMA with halo from padded 3D
NX, NY, NZ, SX = 32, 8, 128, 8
y = jax.random.normal(jax.random.PRNGKey(1), (NX, NY, NZ), jnp.float32)
yp = jnp.pad(y, ((1,1),(0,0),(0,0)))
def k3(y_ref, o_ref, scratch, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(y_ref.at[pl.ds(i*SX, SX+2), :, :], scratch, sem)
    cp.start(); cp.wait()
    o_ref[:] = scratch[1:1+SX] * 2.0
o3 = pl.pallas_call(k3, grid=(NX//SX,),
                    out_shape=jax.ShapeDtypeStruct((NX, NY, NZ), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec((SX, NY, NZ), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((SX+2, NY, NZ), jnp.float32),
                                    pltpu.SemaphoreType.DMA(())])(yp)
print("dma3d-halo", float(jnp.max(jnp.abs(o3 - 2*y))), flush=True)
