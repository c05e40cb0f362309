"""Workload models built on the einsum framework (the reference's
``examples/`` DG wave operators, packaged as reusable model classes)."""

from .maxwell import MaxwellOperator3D, make_maxwell_state
from .wave import WaveOperator3D, make_wave_state

__all__ = ("MaxwellOperator3D", "WaveOperator3D", "make_maxwell_state",
           "make_wave_state")
