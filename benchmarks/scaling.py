"""Multi-device scaling efficiency of the sharded substep on a CPU mesh.

Multi-chip TPU hardware is unavailable in this environment (BASELINE.md
north star: >=80% efficiency 1 chip -> N); this harness measures the same
sharded program (dp particles + z-sharded grid via GSPMD) on N virtual CPU
devices so layout/collective regressions are visible. Run:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py [grid] [particles_log2]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.parallel import make_mesh, shard_sim_state
from libfluid_tpu.sim import new_state, seed_box, substep


def bench(n_devices: int, cfg, state, iters=3):
    mesh = make_mesh(n_devices)
    st = shard_sim_state(state, mesh, shard_grid=n_devices > 1)
    fn = jax.jit(lambda s: substep(s, cfg, 1.0 / 60.0)[0])
    st2 = fn(st)
    jax.block_until_ready(st2.position)
    t0 = time.time()
    out = st2
    for _ in range(iters):
        out = fn(out)
    np.asarray(out.position[0])  # host fetch = real sync
    return (time.time() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cap = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)
    cfg = SimConfig(
        grid_size=(n, n, n),
        gravity=(0.0, -981.0, 0.0),
        particle_capacity=cap,
        scheme=TransferScheme.APIC,
        has_obstacles=False,
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    state = seed_box(state, cfg, (1.0,) * 3, (n / 2 - 1.0,) * 3)
    ndev = len(jax.devices())
    t1 = bench(1, cfg, state)
    tn = bench(ndev, cfg, state)
    eff = t1 / (tn * 1.0)  # same-size problem: speedup vs 1 device
    print(
        f"grid {n}^3  1-dev {t1*1e3:.0f} ms/step   {ndev}-dev {tn*1e3:.0f} ms/step  "
        f"speedup {t1/tn:.2f}x  efficiency {100*t1/(tn*ndev):.0f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
