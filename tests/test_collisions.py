"""Exact DDA collision march (``grid::march_cells`` + ``_detect_collisions``).

Includes the corner-clip regression the round-1 fixed-sample march failed:
a path that enters and exits a solid cell between two sample points tunnels
through under sampling but is caught by a DDA that visits every cell
(``grid.h:140-209``).
"""

import jax.numpy as jnp
import numpy as np

from libfluid_tpu.config import SimConfig
from libfluid_tpu.sim import collisions


def _cfg(**kw):
    kw.setdefault("grid_size", (12, 12, 12))
    kw.setdefault("cell_size", 1.0)
    kw.setdefault("particle_capacity", 16)
    kw.setdefault("has_obstacles", True)
    return SimConfig(**kw)


def _solid_single(cfg, cell):
    s = np.zeros(cfg.grid_size, bool)
    s[cell] = True
    return jnp.asarray(s)


def test_straight_hit_stops_before_wall():
    cfg = _cfg()
    solid = _solid_single(cfg, (6, 5, 5))
    old = jnp.asarray([[4.5, 5.5, 5.5]])
    new = jnp.asarray([[7.5, 5.5, 5.5]])
    out = np.asarray(collisions.resolve_collisions(old, new, solid, cfg))[0]
    # stopped a skin width before x = 6 (the solid cell's lo face)
    assert out[0] <= 6.0 - cfg.boundary_skin_width + 1e-5
    assert out[0] > 4.5
    np.testing.assert_allclose(out[1:], [5.5, 5.5], atol=1e-5)


def test_no_hit_keeps_position():
    cfg = _cfg()
    solid = _solid_single(cfg, (6, 5, 5))
    old = jnp.asarray([[2.5, 2.5, 2.5]])
    new = jnp.asarray([[3.4, 3.1, 2.9]])
    out = np.asarray(collisions.resolve_collisions(old, new, solid, cfg))[0]
    np.testing.assert_allclose(out, np.asarray(new)[0], atol=1e-6)


def test_corner_clip_not_tunneled():
    """The segment passes through cell (5,5,5) only for t in [0.4545, 0.5] —
    shorter than the round-1 sampler's 1/8 spacing, so sampling missed it."""
    cfg = _cfg()
    solid = _solid_single(cfg, (5, 5, 5))
    old = jnp.asarray([[5.9, 4.5, 5.5]])
    new = jnp.asarray([[6.1, 5.6, 5.5]])

    # the old 8-sample march misses: no sample lands inside the solid cell
    ts = np.linspace(0.0, 1.0, 9)
    seg = np.asarray(old)[0] + ts[:, None] * (np.asarray(new)[0] - np.asarray(old)[0])
    cells = np.floor(seg).astype(int)
    assert not any((tuple(c) == (5, 5, 5)) for c in cells), "test setup broken"

    out = np.asarray(collisions.resolve_collisions(old, new, solid, cfg))[0]
    moved = np.linalg.norm(out - np.asarray(new)[0])
    assert moved > 1e-4, "DDA must catch the corner clip the sampler missed"
    # final position must not be inside the solid cell
    assert tuple(np.floor(out).astype(int)) != (5, 5, 5)


def test_diagonal_slide_preserves_tangential_motion():
    """A hit cancels motion along the hit axis but keeps sliding along the
    others (``simulation.cpp:641-643``: to[dim] = from[dim])."""
    cfg = _cfg()
    s = np.zeros(cfg.grid_size, bool)
    s[6, :, :] = True  # wall plane at x in [6, 7)
    solid = jnp.asarray(s)
    old = jnp.asarray([[5.5, 5.5, 5.5]])
    new = jnp.asarray([[6.5, 7.0, 5.5]])
    out = np.asarray(collisions.resolve_collisions(old, new, solid, cfg))[0]
    assert out[0] <= 6.0 - cfg.boundary_skin_width + 1e-5
    # y motion continues past the x-impact point
    assert out[1] > 6.0


def test_resting_contact_skin():
    """Particles inside the skin of a solid floor get pushed up (exact port
    of simulation.cpp:652-681)."""
    cfg = _cfg()
    s = np.zeros(cfg.grid_size, bool)
    s[:, 0, :] = True
    solid = jnp.asarray(s)
    p = jnp.asarray([[5.5, 1.02, 5.5]])
    out = np.asarray(collisions.resolve_collisions(p, p, solid, cfg))[0]
    np.testing.assert_allclose(out[1], 1.0 + cfg.boundary_skin_width, atol=1e-6)
