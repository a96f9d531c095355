import time
import jax
import jax.numpy as jnp

N = 1 << 21
NX = NY = NZ = 128
F = (NX + 1) * NY * NZ

key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (N, 3), jnp.float32, 1.0, 63.0)
val = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32)

coords = jnp.stack([pos[:, 0], pos[:, 1] - 0.5, pos[:, 2] - 0.5], -1)
OFFS = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]

def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:44s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out

def current(coords, val):
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros((F,), jnp.float32)
    den = jnp.zeros((F,), jnp.float32)
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), -1)
        flat = (idx[:, 0] * NY + idx[:, 1]) * NZ + idx[:, 2]
        flat = jnp.clip(flat, 0, F - 1)
        num = num.at[flat].add(w * val)
        den = den.at[flat].add(w)
    return num, den

def one_scatter(coords, val):
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    flats, vals2 = [], []
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), -1)
        flat = (idx[:, 0] * NY + idx[:, 1]) * NZ + idx[:, 2]
        flats.append(jnp.clip(flat, 0, F - 1))
        vals2.append(jnp.stack([w * val, w], -1))
    flat = jnp.concatenate(flats)              # (8N,)
    v2 = jnp.concatenate(vals2)                # (8N, 2)
    out = jnp.zeros((F, 2), jnp.float32).at[flat].add(v2)
    return out[:, 0], out[:, 1]

def pair_scatter(coords, val):
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    num = jnp.zeros((F, 2), jnp.float32)
    for off in OFFS:
        idx = base + jnp.asarray(off, jnp.int32)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), -1)
        flat = (idx[:, 0] * NY + idx[:, 1]) * NZ + idx[:, 2]
        flat = jnp.clip(flat, 0, F - 1)
        num = num.at[flat].add(jnp.stack([w * val, w], -1))
    return num[:, 0], num[:, 1]

def wide_scatter(coords, val):
    """one scatter per particle: row = 18 contiguous face slots? NO —
    scatter (N,) rows of 8 offsets is not contiguous. Instead scatter the
    2x2x2 brick as a (2,2,2) window: indices = base only, values (N,2,2,2,2)
    into (NX+1+1, NY+1, NZ+1, 2) padded grid via scatter-add of windows."""
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    wx = jnp.stack([1 - frac[:, 0], frac[:, 0]], -1)  # (N,2)
    wy = jnp.stack([1 - frac[:, 1], frac[:, 1]], -1)
    wz = jnp.stack([1 - frac[:, 2], frac[:, 2]], -1)
    w = wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    v2 = jnp.stack([w * val[:, None, None, None], w], -1)  # (N,2,2,2,2)
    grid = jnp.zeros((NX + 2, NY + 1, NZ + 1, 2), jnp.float32)
    import jax.lax as lax
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    out = lax.scatter_add(
        grid, base, v2, dn,
        indices_are_sorted=False, unique_indices=False,
        mode=lax.GatherScatterMode.CLIP,
    )
    return out[:NX + 1, :NY, :NZ, 0].reshape(-1), out[:NX + 1, :NY, :NZ, 1].reshape(-1)

n0, d0 = timeit("p2g axis current (16 scatters)", current, coords, val)
n1, d1 = timeit("p2g axis one concat scatter", one_scatter, coords, val)
n2, d2 = timeit("p2g axis 8 pair scatters", pair_scatter, coords, val)
n3, d3 = timeit("p2g axis windowed brick scatter", wide_scatter, coords, val)
for nm, (nn, dd) in [("concat", (n1, d1)), ("pair", (n2, d2)), ("brick", (n3, d3))]:
    print(f"  {nm} err:", float(jnp.max(jnp.abs(nn - n0))), float(jnp.max(jnp.abs(dd - d0))), flush=True)
