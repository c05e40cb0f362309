"""
feinsum_tpu — a TPU-native batched-einsum transform-database library.

Rebuild of kaushikcfd/feinsum's capabilities on an idiomatic JAX/Pallas/XLA
stack: an immutable :class:`BatchedEinsum` IR with parametric axes, canonical-
form hashing (first-party C++ graph canonicalizer) for database lookup,
schedule descriptors as *data* interpreted by a Pallas emitter, an empirical
validate→time→record autotuning loop persisted to sqlite, and roofline-relative
reporting against TPU MXU-peak / HBM-bandwidth tables.
"""

from .canonicalization import (
    canonicalize_einsum,
    get_substitution_mapping_between_isomorphic_batched_einsums,
)
from .diagnostics import (
    EinsumMatchError,
    EinsumTunitMatchError,
    InvalidParameterError,
    NoDevicePeaksInfoError,
    NoFactInDatabaseError,
    TransformValidationError,
)
from .einsum import (
    Array,
    BatchedEinsum,
    EinsumAxisAccess,
    FreeAxis,
    SizeParam,
    SummationAxis,
)
from .make_einsum import array, batched_einsum, einsum
from .utils import IndexNameGenerator, get_tccg_benchmark

__version__ = "0.1.0"

__all__ = (
    "Array",
    "BatchedEinsum",
    "EinsumAxisAccess",
    "EinsumMatchError",
    "EinsumTunitMatchError",
    "FreeAxis",
    "IndexNameGenerator",
    "InvalidParameterError",
    "NoDevicePeaksInfoError",
    "NoFactInDatabaseError",
    "SizeParam",
    "SummationAxis",
    "TransformValidationError",
    "array",
    "batched_einsum",
    "canonicalize_einsum",
    "einsum",
    "get_substitution_mapping_between_isomorphic_batched_einsums",
    "get_tccg_benchmark",
)
