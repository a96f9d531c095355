"""2-process jax.distributed bring-up over localhost CPU (SURVEY §5
distributed-backend row; VERDICT r2 missing #5).

Each subprocess hosts 2 virtual CPU devices; the pair forms a 4-device
global mesh and runs a psum and a z-sharded halo exchange across the
process boundary."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.environ["REPO"])
    from libfluid_tpu.parallel import distributed
    from libfluid_tpu.parallel.zshard import AXIS, pad_z

    pid = int(sys.argv[1])
    distributed.init_distributed(
        coordinator_address=os.environ["COORD"], num_processes=2, process_id=pid
    )
    assert distributed.process_count() == 2
    mesh = distributed.global_mesh(("dp",))
    assert mesh.devices.size == 4

    # global psum across the process boundary
    x = jnp.arange(8.0)
    out = jax.jit(
        jax.shard_map(
            lambda v: jax.lax.psum(jnp.sum(v), AXIS),
            mesh=mesh, in_specs=P("dp"), out_specs=P(),
        )
    )(x)
    np.testing.assert_allclose(np.asarray(out), 28.0)

    # z halo exchange: ghost layers cross processes at the seam
    z = jnp.arange(16.0).reshape(1, 1, 16)
    ext = jax.jit(
        jax.shard_map(
            lambda v: pad_z(v),
            mesh=mesh, in_specs=P(None, None, "dp"),
            out_specs=P(None, None, "dp"),
        )
    )(z)
    from jax.experimental import multihost_utils
    got = np.asarray(multihost_utils.process_allgather(ext, tiled=True))
    got = got.reshape(4, 6)  # 4 tiles of nzl=4 (+2 ghosts)
    for t in range(4):
        lo = 0.0 if t == 0 else 4.0 * t - 1.0
        hi = 0.0 if t == 3 else 4.0 * (t + 1)
        assert got[t, 0] == lo and got[t, 5] == hi, (t, got[t])
        np.testing.assert_allclose(got[t, 1:5], np.arange(4.0) + 4 * t)
    print("worker", pid, "ok", flush=True)
    """
)


def test_two_process_cpu_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        **os.environ,
        "COORD": f"127.0.0.1:{port}",
        "REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} ok" in out
