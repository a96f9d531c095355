"""DCC node-graph semantics: caching, invalidation, and the full pipeline."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # frame-loop integration

from libfluid_tpu.config import MesherConfig
from libfluid_tpu.dcc import (
    GridNode,
    MesherNode,
    PointCloudLoaderNode,
    create_simulation_pipeline,
)
from libfluid_tpu.sim import seed_box


@pytest.fixture(scope="module")
def grid_node():
    g = GridNode(
        grid_size=(12, 12, 12),
        gravity=(0.0, -100.0, 0.0),
        particle_capacity=1 << 12,
        frames_per_second=60.0,
    )
    g.add_seeder(lambda s, c: seed_box(s, c, (2.0, 6.0, 2.0), (4.0, 4.0, 4.0)))
    return g


def test_frame_cache_monotone_and_scrub(grid_node):
    grid_node.set_time(2)
    p2 = grid_node.evaluate()
    assert len(grid_node._cache) == 3
    grid_node.set_time(4)
    p4 = grid_node.evaluate()
    assert len(grid_node._cache) == 5
    # scrubbing backwards hits the cache, no recompute
    grid_node.set_time(2)
    p2_again = grid_node.evaluate()
    np.testing.assert_array_equal(p2, p2_again)
    assert len(grid_node._cache) == 5
    # gravity pulls particles down over time
    assert p4[:, 1].mean() < p2[:, 1].mean()


def test_attribute_change_invalidates_cache(grid_node):
    grid_node.set_time(1)
    grid_node.evaluate()
    assert len(grid_node._cache) > 0
    grid_node.set(gravity=(0.0, -50.0, 0.0))
    assert len(grid_node._cache) == 0
    p1 = grid_node.evaluate()
    assert p1.shape[1] == 3


def test_pipeline_mesher_downstream():
    grid, mesher = create_simulation_pipeline(
        grid_kwargs=dict(
            grid_size=(12, 12, 12),
            gravity=(0.0, -100.0, 0.0),
            particle_capacity=1 << 12,
            frames_per_second=60.0,
        ),
        mesher_cfg=MesherConfig(
            grid_size=(24, 24, 24), cell_size=0.5, particle_extent=1.0,
            max_triangles=1 << 14,
        ),
    )
    grid.add_seeder(lambda s, c: seed_box(s, c, (2.0, 2.0, 2.0), (6.0, 4.0, 6.0)))
    grid.set_time(0)
    verts, count = mesher.evaluate()
    assert count > 0
    active = verts[:count]
    assert np.isfinite(active).all()
    # mesh hugs the seeded region (+/- kernel extent)
    assert active[..., 1].max() < 8.0
    # scrubbing time re-dirties the mesher
    assert mesher._dirty is False
    grid.set_time(1)
    assert mesher._dirty is True


def test_point_cloud_loader(tmp_path):
    from libfluid_tpu.io.point_cloud import save_points

    pts = np.random.default_rng(0).uniform(0, 10, (17, 3))
    path = str(tmp_path / "points.txt")
    save_points(path, pts)
    node = PointCloudLoaderNode(path)
    out = node.evaluate()
    np.testing.assert_allclose(out, pts, rtol=1e-6)


def test_grid_manipulator_overlay():
    """GridManipulatorNode mirrors the Maya viewport manipulator
    (grid_manipulator_node.cpp:27-78): domain box segments + frame particles."""
    import numpy as np

    from libfluid_tpu import dcc

    grid, _ = dcc.create_simulation_pipeline(
        grid_kwargs=dict(grid_size=(12, 12, 12), particle_capacity=1 << 10)
    )
    grid.add_seeder(
        lambda s, cfg: __import__(
            "libfluid_tpu.sim", fromlist=["seed_box"]
        ).seed_box(s, cfg, (1.0, 1.0, 1.0), (5.0, 5.0, 5.0))
    )
    manip = dcc.GridManipulatorNode(grid)
    grid.set_time(1)
    out = manip.evaluate()
    assert out["box_segments"].shape == (12, 2, 3)
    assert out["particles"].shape[1] == 3 and out["particles"].shape[0] > 0
    # all particles inside the box
    lo = out["box_segments"].min(axis=(0, 1))
    hi = out["box_segments"].max(axis=(0, 1))
    assert np.all(out["particles"] >= lo - 1e-6)
    assert np.all(out["particles"] <= hi + 1e-6)
    # time change invalidates through the connection
    grid.set_time(2)
    out2 = manip.evaluate()
    assert out2["particles"].shape[0] > 0
