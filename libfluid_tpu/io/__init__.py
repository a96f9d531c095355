"""Host-side I/O: images, meshes, point clouds, checkpoints."""

from libfluid_tpu.io.ppm import save_ppm
from libfluid_tpu.io.obj import save_obj
from libfluid_tpu.io.point_cloud import save_points, load_points

__all__ = ["save_ppm", "save_obj", "save_points", "load_points"]
