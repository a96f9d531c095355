import time
import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 21
NX = NY = NZ = 128
C = NX * NY * NZ

key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (N, 3), jnp.float32, 1.0, 63.0)
cell3 = jnp.floor(pos).astype(jnp.int32)
cell = (cell3[:, 0] * NY + cell3[:, 1]) * NZ + cell3[:, 2]
order = jnp.argsort(cell)
scell = cell[order]
spos = pos[order]
val = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32)
sval = val[order]
cell_start = jnp.searchsorted(scell, jnp.arange(C, dtype=scell.dtype)).astype(jnp.int32)
counts = jax.ops.segment_sum(jnp.ones_like(cell), cell, num_segments=C)

grid = jax.random.normal(jax.random.PRNGKey(2), (NX + 1, NY, NZ), jnp.float32)


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:42s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)
    return out


# --- scatter-add variants (1 offset, representative of 1/18 of p2g axis) ---
def scatter_current(v, c):
    return jnp.zeros((C,), jnp.float32).at[jnp.clip(c, 0, C - 1)].add(v)

def scatter_sorted(v, c):
    return jnp.zeros((C,), jnp.float32).at[c].add(
        v, indices_are_sorted=True, mode="drop"
    )

def segsum_sorted(v, c):
    return jax.ops.segment_sum(v, c, num_segments=C, indices_are_sorted=True)

def cumsum_trick(v, start, cnt):
    cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(v)])
    return cs[start + cnt] - cs[start]

a = timeit("scatter_add unsorted", scatter_current, val, cell)
b = timeit("scatter_add sorted-flag", scatter_sorted, sval, scell)
c_ = timeit("segment_sum sorted-flag", segsum_sorted, sval, scell)
d = timeit("cumsum boundary trick", cumsum_trick, sval, cell_start, counts)
print("  max|err| sorted-scatter vs unsorted:", float(jnp.max(jnp.abs(a - b))))
print("  max|err| segsum vs unsorted:", float(jnp.max(jnp.abs(a - c_))))
print("  max|err| cumsum vs unsorted:", float(jnp.max(jnp.abs(a - d))), flush=True)

# --- full 8-offset scatter (like one p2g axis: 8 offsets x (num+den)) ---
coords = jnp.stack([pos[:, 0], pos[:, 1] - 0.5, pos[:, 2] - 0.5], -1)
base = jnp.floor(coords).astype(jnp.int32)
frac = coords - base

def p2g_axis_scatter(pos, val):
    num = jnp.zeros(((NX + 1) * NY * NZ,), jnp.float32)
    den = jnp.zeros_like(num)
    for off in [(a, b, cc) for a in (0, 1) for b in (0, 1) for cc in (0, 1)]:
        offv = jnp.asarray(off, jnp.int32)
        idx = base + offv
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), -1)
        flat = (idx[:, 0] * NY + idx[:, 1]) * NZ + idx[:, 2]
        flat = jnp.clip(flat, 0, num.shape[0] - 1)
        num = num.at[flat].add(w * val)
        den = den.at[flat].add(w)
    return num, den

def p2g_axis_segsum(spos, sval, scell):
    """18 cell-relative offsets; per-offset sorted segment-sum over cells,
    then dense shift-accumulate."""
    coords = jnp.stack([spos[:, 0], spos[:, 1] - 0.5, spos[:, 2] - 0.5], -1)
    c3 = jnp.floor(spos).astype(jnp.int32)
    num = jnp.zeros((NX + 1, NY, NZ), jnp.float32)
    den = jnp.zeros_like(num)
    for a in (0, 1):
        for b in (-1, 0):
            for cc in (-1, 0):
                f = c3 + jnp.asarray([a, b, cc], jnp.int32)
                d = coords - f.astype(jnp.float32)
                w = jnp.prod(jnp.maximum(1.0 - jnp.abs(d), 0.0), -1)
                sn = jax.ops.segment_sum(w * sval, scell, num_segments=C,
                                         indices_are_sorted=True).reshape(NX, NY, NZ)
                sd = jax.ops.segment_sum(w, scell, num_segments=C,
                                         indices_are_sorted=True).reshape(NX, NY, NZ)
                # face[x+a, y+b, z+cc] += S[x,y,z]
                xs = slice(a, a + NX)
                ys = slice(max(b, 0), min(NY + b, NY))
                zs = slice(max(cc, 0), min(NZ + cc, NZ))
                ys_s = slice(max(-b, 0), min(NY - b, NY))
                zs_s = slice(max(-cc, 0), min(NZ - cc, NZ))
                num = num.at[xs, ys, zs].add(sn[:, ys_s, zs_s])
                den = den.at[xs, ys, zs].add(sd[:, ys_s, zs_s])
    return num, den

n1, d1 = timeit("p2g axis: 8-offset scatter", p2g_axis_scatter, pos, val)
n2, d2 = timeit("p2g axis: 18-offset segsum", p2g_axis_segsum, spos, sval, scell)
print("  p2g num max|err|:", float(jnp.max(jnp.abs(n1.reshape(NX+1,NY,NZ) - n2))))
print("  p2g den max|err|:", float(jnp.max(jnp.abs(d1.reshape(NX+1,NY,NZ) - d2))), flush=True)

# --- gather variants (one g2p axis: 8 gathers) ---
def g2p_gather_current(grid, pos):
    coords = jnp.stack([pos[:, 0], pos[:, 1] - 0.5, pos[:, 2] - 0.5], -1)
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    out = jnp.zeros((N,), jnp.float32)
    for off in [(a, b, cc) for a in (0, 1) for b in (0, 1) for cc in (0, 1)]:
        offv = jnp.asarray(off, jnp.int32)
        idx = jnp.clip(base + offv, 0, jnp.asarray([NX, NY - 1, NZ - 1]))
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), frac, 1.0 - frac), -1)
        out = out + w * grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    return out

def g2p_gather_stacked(grid, pos, cell):
    """Stack the 18 cell-relative shifts as trailing dim; one row gather."""
    coords = jnp.stack([pos[:, 0], pos[:, 1] - 0.5, pos[:, 2] - 0.5], -1)
    c3 = jnp.floor(pos).astype(jnp.int32)
    shifts = []
    offs = [(a, b, cc) for a in (0, 1) for b in (-1, 0) for cc in (-1, 0)]
    padded = jnp.pad(grid, ((0, 0), (1, 0), (1, 0)))  # allow -1 shifts
    for a, b, cc in offs:
        shifts.append(
            jax.lax.dynamic_slice(padded, (a, 1 + b, 1 + cc), (NX, NY, NZ))
        )
    stacked = jnp.stack(shifts, axis=-1).reshape(C, len(offs))  # (C, 18)
    rows = stacked[cell]  # (N, 18)
    w = []
    for a, b, cc in offs:
        f = c3 + jnp.asarray([a, b, cc], jnp.int32)
        d = coords - f.astype(jnp.float32)
        w.append(jnp.prod(jnp.maximum(1.0 - jnp.abs(d), 0.0), -1))
    return jnp.sum(rows * jnp.stack(w, -1), -1)

g1 = timeit("g2p axis: 8 elem gathers", g2p_gather_current, grid, pos)
g2 = timeit("g2p axis: stacked row gather", g2p_gather_stacked, grid, pos, cell)
print("  g2p max|err|:", float(jnp.max(jnp.abs(g1 - g2))), flush=True)

# --- sort cost ---
timeit("argsort 2M int32", lambda c: jnp.argsort(c), cell)
timeit("sort pair (lax.sort key+id)", lambda c: jax.lax.sort(
    (c, jnp.arange(N, dtype=jnp.int32)), num_keys=1), cell)
