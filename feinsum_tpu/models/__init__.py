"""Workload models built on the einsum framework (the reference's
``examples/`` DG wave operators, packaged as reusable model classes)."""

from .wave import WaveOperator3D, make_wave_state

__all__ = ("WaveOperator3D", "make_wave_state")
