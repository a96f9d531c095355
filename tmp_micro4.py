import time
import jax, jax.numpy as jnp

N = 1 << 21
nx = ny = nz = 128
C = nx * ny * nz
F = (nx + 1) * ny * nz

key = jax.random.PRNGKey(0)
vals = jax.random.normal(key, (N,), jnp.float32)
vals2 = jax.random.normal(key, (N, 2), jnp.float32)
# sorted face ids: 8 particles/cell, cell-sorted
ids_sorted = jnp.sort(jax.random.randint(key, (N,), 0, F))
ids_rand = jax.random.randint(key, (N,), 0, F)

def _sync(out):
    x = jax.tree_util.tree_leaves(out)[0]
    return float(x[(0,) * x.ndim].astype(jnp.float32))

def timeit(name, f, *args):
    jf = jax.jit(f)
    out = jf(*args); _sync(out)
    t0 = time.time()
    for _ in range(5):
        out = jf(*args)
    _sync(out)
    print(f"{name:44s} {(time.time()-t0)/5*1e3:8.1f} ms")
    return out

import functools
def sadd(v, i, sorted_):
    z = jnp.zeros((F,), jnp.float32)
    return z.at[i].add(v, indices_are_sorted=sorted_, mode="drop")

def sadd2(v, i, sorted_):
    z = jnp.zeros((F, 2), jnp.float32)
    return z.at[i].add(v, indices_are_sorted=sorted_, mode="drop")

def segsum(v, i):
    return jax.ops.segment_sum(v, i, num_segments=F, indices_are_sorted=True)

timeit("scatter-add w=1 random", functools.partial(sadd, sorted_=False), vals, ids_rand)
timeit("scatter-add w=1 sorted flag", functools.partial(sadd, sorted_=True), vals, ids_sorted)
timeit("scatter-add w=2 sorted flag", functools.partial(sadd2, sorted_=True), vals2, ids_sorted)
timeit("segment_sum sorted", segsum, vals, ids_sorted)

# 8 fused scatter-adds (one per tap) — the full per-axis P2G cost shape
def p2g_axis_shape(v2, i):
    num = jnp.zeros((F,), jnp.float32)
    den = jnp.zeros((F,), jnp.float32)
    for t in range(8):
        w = v2[:, 0] * (0.1 * t + 0.3)
        num = num.at[i].add(w * v2[:, 1], indices_are_sorted=True, mode="drop")
        den = den.at[i].add(w, indices_are_sorted=True, mode="drop")
    return num, den

timeit("8 taps x 2 scatter-adds sorted", p2g_axis_shape, vals2, ids_sorted)
