"""Multi-device scaling of the explicit z-sharded substep on a CPU mesh.

Multi-chip TPU hardware is unavailable in this environment (BASELINE.md
north star: >=80% efficiency 1 chip -> N); this harness runs the SAME
shard_map program (``libfluid_tpu.parallel.zshard``) on N virtual CPU
devices. The N "devices" timeshare one socket, so the ideal N-device
wall-clock is ~1.0x the 1-device wall-clock — the measured ratio is the
total sharding overhead (exchanges + redundant ghost work). Run:

    python benchmarks/scaling.py [grid_n] [particles_log2]

Writes SCALING_r0N.json next to the repo root when invoked with --json out.

The scene is a water WALL spanning z (testbed setup 3,
``testbed/main.cpp:162-166``) — spatial decomposition is load-balanced for
it, so the number measures communication, not imbalance.
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.parallel import make_mesh, substep_z, zshard_state
from libfluid_tpu.sim import new_state, seed_box, substep


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])[:1]


def bench_dense(cfg, state, iters=5):
    fn = jax.jit(lambda s: substep(s, cfg, 1.0 / 60.0)[0])
    out = fn(state)
    out = fn(out)
    _sync(out.position)
    t0 = time.time()
    for _ in range(iters):
        out = fn(out)
    _sync(out.position)
    return (time.time() - t0) / iters


def bench_zshard(cfg, state, n_devices, iters=5):
    mesh = make_mesh(n_devices)
    st = zshard_state(state, cfg, mesh)
    fn = jax.jit(lambda s: substep_z(s, cfg, 1.0 / 60.0, mesh)[0])
    out = fn(st)
    out = fn(out)
    _sync(out.position)
    t0 = time.time()
    for _ in range(iters):
        out = fn(out)
    _sync(out.position)
    return (time.time() - t0) / iters


def run_one(n, cap_log2, iters=5):
    cfg = SimConfig(
        grid_size=(n, n, n),
        gravity=(0.0, -981.0, 0.0),
        particle_capacity=1 << cap_log2,
        scheme=TransferScheme.APIC,
        has_obstacles=False,
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    # water wall: thin in x, full in z (z-balanced; testbed setup 3)
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (n / 4 - 1.0, n / 2 - 1.0, n - 2.0))
    ndev = len(jax.devices())

    t1 = bench_dense(cfg, state, iters)
    tz1 = bench_zshard(cfg, state, 1, iters)
    tn = bench_zshard(cfg, state, ndev, iters)
    # zshard-1dev vs zshard-Ndev is the CLEAN communication measurement:
    # same program, only the mesh differs (VERDICT r4 weak #6 — comparing
    # against the dense path conflated code-path efficiency with
    # communication). The dense column stays as context.
    comm = tn / tz1
    path = tz1 / t1
    print(
        f"grid {n}^3  dense-1dev {t1*1e3:.0f} ms  zshard-1dev {tz1*1e3:.0f} ms"
        f"  zshard-{ndev}dev {tn*1e3:.0f} ms   comm-overhead {comm:.2f}x"
        f"  path-overhead {path:.2f}x "
        f"(timeshared CPU mesh: 1.0x == zero sharding overhead)",
        flush=True,
    )
    return {
        "grid": n,
        "particles": int(np.asarray(state.active).sum()),
        "dense_1dev_ms": round(t1 * 1e3, 1),
        "zshard_1dev_ms": round(tz1 * 1e3, 1),
        f"zshard_{ndev}dev_ms": round(tn * 1e3, 1),
        "comm_overhead_x": round(comm, 3),
        "path_overhead_x": round(path, 3),
    }


def main():
    # default sweep: 64^3 AND the production bench scale 128^3 (VERDICT r3
    # next #10: the 64^3 point says little about 128^3)
    grids = (
        [(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 18)]
        if len(sys.argv) > 1 and sys.argv[1].isdigit()
        else [(64, 18), (128, 21)]
    )
    points = [
        run_one(n, c, iters=3 if n >= 128 else 5) for n, c in grids
    ]
    out = {
        "points": points,
        "note": "timeshared CPU mesh; 1.0x means zero sharding overhead",
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        with open(os.path.join(_ROOT, "SCALING_r05.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
