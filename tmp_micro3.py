import time
import jax, jax.numpy as jnp

N = 1 << 21
K = 16
nx = ny = nz = 128
C = nx * ny * nz
M = C * K

key = jax.random.PRNGKey(0)
# realistic slot indices: 8 particles/cell over lower half of grid, rank-major
cell = (jnp.arange(N, dtype=jnp.int32) // 8) % C
rank = jnp.arange(N, dtype=jnp.int32) % 8
slot = rank * C + cell          # plane-major (current layout)
slot_cm = cell * K + rank       # cell-major (strictly increasing)

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
    print(f"{name:40s} {(time.time()-t0)/5*1e3:8.1f} ms")
    return out

for w in (1, 8, 16, 32, 64):
    payload = jax.random.normal(key, (N, w), jnp.float32)
    def sc(p, s, w=w):
        g = jnp.zeros((M + 1, w), jnp.float32)
        return g.at[s].set(p, mode="drop", unique_indices=True)
    timeit(f"scatter rows w={w}", sc, payload, slot)

payload16 = jax.random.normal(key, (N, 16), jnp.float32)
def sc_cm(p, s):
    g = jnp.zeros((M + 1, 16), jnp.float32)
    return g.at[s].set(p, mode="drop", unique_indices=True)
timeit("scatter rows w=16 cell-major sorted", sc_cm, payload16, slot_cm)

# gather row widths
idx = jax.random.randint(key, (N,), 0, C)
for w in (16, 32, 64):
    t = jax.random.normal(key, (C, w), jnp.float32)
    timeit(f"gather rows w={w}", lambda t, i: t[i], t, idx)

# bf16 scatter
pb = jax.random.normal(key, (N, 16), jnp.bfloat16)
def scb(p, s):
    g = jnp.zeros((M + 1, 16), jnp.bfloat16)
    return g.at[s].set(p, mode="drop", unique_indices=True)
timeit("scatter rows w=16 bf16", scb, pb, slot)
