import time
import jax, jax.numpy as jnp

N = 1 << 21
K = 16
W = 16
nx = ny = nz = 128
C = nx * ny * nz
M = C * K

key = jax.random.PRNGKey(0)
payload = jax.random.normal(key, (N, W), jnp.float32)
# unique slot indices: rank*num_cells + cell for 8 particles/cell over the lower half
cell = jnp.arange(N, dtype=jnp.int32) % C
rank = jnp.arange(N, dtype=jnp.int32) // C
slot = rank * C + cell
slot_cellmajor = cell * K + rank


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return float(x[(0,) * x.ndim].astype(jnp.float32))

def timeit(name, f, *args):
    jf = jax.jit(f)
    out = jf(*args); _sync(out)
    t0 = time.time()
    for _ in range(5):
        out = jf(*args)
    _sync(out)
    print(f"{name:34s} {(time.time()-t0)/5*1e3:8.1f} ms")
    return out


# --- slot build variants ---
def build_now(payload, slot):
    g = jnp.zeros((M + 1, W), jnp.float32)
    g = g.at[slot].set(payload, mode="drop", unique_indices=True)
    return g[:-1].T.reshape(W, K, nx, ny, nz)

def build_noT(payload, slot):
    g = jnp.zeros((M + 1, W), jnp.float32)
    return g.at[slot].set(payload, mode="drop", unique_indices=True)

def build_percol(payload, slot):
    cols = []
    for c in range(W):
        col = jnp.zeros((M + 1,), jnp.float32)
        col = col.at[slot].set(payload[:, c], mode="drop", unique_indices=True)
        cols.append(col[:-1].reshape(K, nx, ny, nz))
    return jnp.stack(cols)

def transpose_only(g):
    return g[:-1].T.reshape(W, K, nx, ny, nz)

timeit("build now (scatter+T)", build_now, payload, slot)
g = timeit("scatter rows only", build_noT, payload, slot)
timeit("transpose only", transpose_only, g)
timeit("build per-column scatters", build_percol, payload, slot)

# --- g2p gather variants ---
tbl3 = [jax.random.normal(key, (C, 18), jnp.float32) for _ in range(3)]
tbl54 = jnp.concatenate(tbl3, axis=1)
tbl64 = jnp.pad(tbl54, ((0, 0), (0, 10)))
idx = jax.random.randint(key, (N,), 0, C)

def gather3(tbls, idx):
    return [t[idx] for t in tbls]

def gather54(t, idx):
    return t[idx]

timeit("gather 3x(N,18)", gather3, tbl3, idx)
timeit("gather 1x(N,54)", gather54, tbl54, idx)
timeit("gather 1x(N,64)", gather54, tbl64, idx)

# sorted (cell-coherent) index — the real case after binning
idx_sorted = jnp.sort(idx)
timeit("gather 1x(N,54) sorted idx", gather54, tbl54, idx_sorted)
timeit("gather 3x(N,18) sorted idx", gather3, tbl3, idx_sorted)

# --- argsort cost for reference ---
keys = jax.random.randint(key, (N,), 0, C).astype(jnp.int32)
timeit("argsort 2M int32", lambda k: jnp.argsort(k), keys)

