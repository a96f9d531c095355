"""Simulation pipeline: functional PIC/FLIP/APIC particle-in-cell liquid solver.

Replaces the reference's L4a layer (``simulation.h/.cpp``, ``mac_grid.h/.cpp``,
``pressure_solver.h/.cpp``). The mutable ``simulation`` class becomes a
:class:`~libfluid_tpu.sim.state.SimState` pytree plus pure functions; the whole
``time_step`` is one jittable transition.
"""

from libfluid_tpu.sim.state import SimState, SourceSet, new_state, seed_box, seed_sphere, seed_func
from libfluid_tpu.sim.step import step, substep, cfl_dt, Diagnostics

__all__ = [
    "SimState",
    "SourceSet",
    "new_state",
    "seed_box",
    "seed_sphere",
    "seed_func",
    "step",
    "substep",
    "cfl_dt",
    "Diagnostics",
]
