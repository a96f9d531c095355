"""Surface meshing: particles -> implicit surface -> triangle mesh.

Replaces the reference L3 ``mesher`` (``mesher.h``/``mesher.cpp``): the
Zhu–Bridson style implicit surface sampled on grid nodes, then marching cubes.
"""

from libfluid_tpu.mesher.surface import sample_surface
from libfluid_tpu.mesher.marching_cubes import marching_cubes, MeshBuffers, generate_mesh

__all__ = ["sample_surface", "marching_cubes", "MeshBuffers", "generate_mesh"]
