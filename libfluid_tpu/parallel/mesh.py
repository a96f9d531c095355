"""Device mesh and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """1-D data mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), axis_names)


def particle_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (particle/ray) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def grid_sharding_z(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard a (nx, ny, nz) grid along z — the tile layout for halo stencils."""
    return NamedSharding(mesh, P(None, None, axis))
