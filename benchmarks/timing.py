"""Reliable TPU timing under the axon remote backend.

`jax.block_until_ready` does NOT drain the axon execution queue (a 1.6 GB
copy "completes" in 0.05 ms while the following host fetch takes the real
time). The only reliable sync is a device->host fetch, so every measurement
here ends by fetching one scalar element of the result to the host.
"""
import time

import jax
import numpy as np

try:
    from libfluid_tpu.cache import enable_persistent_cache

    enable_persistent_cache()
except Exception:  # pragma: no cover — cache is an optimization only
    pass


def sync(tree) -> None:
    """Force full device-queue drain by fetching one scalar to host."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx])


def timeit(f, *args, iters: int = 5, warmup: int = 2):
    """Median-free simple average of `iters` runs of f(*args), host-synced."""
    out = None
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / iters, out
