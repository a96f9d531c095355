import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms","cpu")
from libfluid_tpu import grids
from libfluid_tpu.config import SimConfig
from libfluid_tpu.sim import transfers as T

cfg = SimConfig(grid_size=(12,12,12), particle_capacity=64)
key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key,(64,3),jnp.float32,3.0,9.0)
arr = jax.random.normal(jax.random.PRNGKey(1),(13,12,12),jnp.float32)

# old implementation for axis 0
_OFFSETS=[(a,b,c) for a in (0,1) for b in (0,1) for c in (0,1)]
from libfluid_tpu.math.interp import grad_hat
coords = grids.face_index_coords(pos,cfg,0)
base = jnp.floor(coords).astype(jnp.int32)
frac = coords-base
dims = jnp.asarray(arr.shape,jnp.int32)
val = jnp.zeros((64,)); grad = jnp.zeros((64,3))
for off in _OFFSETS:
    offv=jnp.asarray(off,jnp.int32)
    idx=base+offv
    inb=jnp.all((idx>=0)&(idx<dims),axis=-1)
    cidx=jnp.clip(idx,0,dims-1)
    sample=jnp.where(inb,arr[cidx[...,0],cidx[...,1],cidx[...,2]],0.)
    w=jnp.prod(jnp.where(jnp.asarray(off,bool),frac,1.0-frac),axis=-1)
    val=val+w*sample
    grad=grad+grad_hat(frac-offv.astype(jnp.float32),cfg.cell_size)*sample[...,None]

g = grids.zeros(cfg)._replace(u=arr)
nv, nc = T.g2p_pic(g,pos,cfg)
print("val err", float(jnp.max(jnp.abs(nv[:,0]-val))))
err = jnp.abs(nc[:,0,:]-grad)
print("grad err", float(jnp.max(err)))
i = int(jnp.argmax(jnp.max(err,axis=1)))
print("worst p", np.asarray(pos[i]), "old", np.asarray(grad[i]), "new", np.asarray(nc[i,0]))

p = pos[i]
cell3 = jnp.floor(p).astype(jnp.int32)
print("cell", np.asarray(cell3))
coords_p = jnp.stack([p[0], p[1]-0.5, p[2]-0.5])
print("coords", np.asarray(coords_p))
# old contributions
base_p = jnp.floor(coords_p).astype(jnp.int32)
frac_p = coords_p - base_p
tot = 0.0
for off in _OFFSETS:
    offv=jnp.asarray(off,jnp.int32)
    idx=base_p+offv
    w=float(jnp.prod(jnp.where(jnp.asarray(off,bool),frac_p,1.0-frac_p)))
    sv=float(arr[idx[0],idx[1],idx[2]])
    tot+=w*sv
    print("old off",off,"idx",np.asarray(idx),"w",round(w,4),"s",round(sv,4))
print("old val",tot)
# new contributions
offsets = T._cell_offsets(0)
table = T._stacked_shifts(arr, offsets, 0)
flatc = int((cell3[0]*12+cell3[1])*12+cell3[2])
rows = table[flatc]
for t,off in enumerate(offsets):
    f = cell3 + jnp.asarray(off,jnp.int32)
    d = coords_p - f.astype(jnp.float32)
    n = jnp.maximum(1-jnp.abs(d),0)
    w = float(jnp.prod(n))
    if w>0: print("new off",off,"f",np.asarray(f),"w",round(w,4),"s",round(float(rows[t]),4),"arr",round(float(arr[f[0],f[1],f[2]]),4))

print("vec old val[i]", float(val[i]), "vec new nv[i,0]", float(nv[i,0]))
j = int(jnp.argmax(jnp.abs(nv[:,0]-val)))
print("worst-val particle", np.asarray(pos[j]), "old", float(val[j]), "new", float(nv[j,0]))
cj = jnp.floor(pos[j]).astype(jnp.int32)
print("cell", np.asarray(cj), "flat", int((cj[0]*12+cj[1])*12+cj[2]))
