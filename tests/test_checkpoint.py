"""Checkpoint save/restore round trips, including sharded restore."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libfluid_tpu import checkpoint
from libfluid_tpu.config import SimConfig, TransferScheme
from libfluid_tpu.sim import new_state, seed_box, substep
from libfluid_tpu.sim.sources import make_source_set


def small_cfg():
    return SimConfig(
        grid_size=(12, 12, 12),
        gravity=(0.0, -10.0, 0.0),
        particle_capacity=1 << 12,
        scheme=TransferScheme.APIC,
    )


def make_state(cfg):
    state = new_state(cfg, jax.random.PRNGKey(3))
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (6.0, 6.0, 6.0))
    src = make_source_set([[2, 8, 2]], (5.0, 0.0, 0.0), coerce_velocity=True)
    return state._replace(sources=src)


def assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_round_trip(tmp_path):
    cfg = small_cfg()
    state = make_state(cfg)
    state, _ = jax.jit(lambda s: substep(s, cfg, 1.0 / 60.0))(state)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, state, metadata={"frame": 7, "setup": 0})

    template = make_state(cfg)
    restored = checkpoint.restore(path, template)
    assert_trees_equal(state, restored)
    assert checkpoint.metadata(path) == {"frame": 7, "setup": 0}


@pytest.mark.slow
def test_resume_continues_identically(tmp_path):
    """stepping a restored state == stepping the original state."""
    cfg = small_cfg()
    state = make_state(cfg)
    fn = jax.jit(lambda s: substep(s, cfg, 1.0 / 60.0))
    state, _ = fn(state)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, state)
    restored = checkpoint.restore(path, make_state(cfg))
    a, _ = fn(state)
    b, _ = fn(restored)
    assert_trees_equal(a, b)


def test_missing_leaf_strictness(tmp_path):
    cfg = small_cfg()
    state = make_state(cfg)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, {"position": state.position})
    with pytest.raises(KeyError):
        checkpoint.restore(
            path, {"position": state.position, "velocity": state.velocity}
        )
    out = checkpoint.restore(
        path,
        {"position": jnp.zeros_like(state.position), "velocity": state.velocity},
        strict=False,
    )
    np.testing.assert_array_equal(np.asarray(out["position"]), np.asarray(state.position))
    np.testing.assert_array_equal(np.asarray(out["velocity"]), np.asarray(state.velocity))


def test_shape_mismatch_rejected(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, {"x": jnp.zeros((4, 3))})
    with pytest.raises(ValueError):
        checkpoint.restore(path, {"x": jnp.zeros((5, 3))})


def test_sharded_restore(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from libfluid_tpu.parallel import make_mesh

    cfg = small_cfg()
    state = make_state(cfg)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, {"position": state.position})

    mesh = make_mesh(len(jax.devices()))
    sh = NamedSharding(mesh, P("dp"))
    out = checkpoint.restore(path, {"position": state.position}, sharding=sh)
    assert out["position"].sharding == sh
    np.testing.assert_array_equal(
        np.asarray(out["position"]), np.asarray(state.position)
    )
