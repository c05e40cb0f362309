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
from .codegen import (
    EinsumProgram,
    ScheduleDescriptor,
    build_executable,
    generate_program,
    generate_program_with_opt_einsum_schedule,
)
from .contraction_schedule import (
    ContractionSchedule,
    EinsumOperand,
    IntermediateResult,
    get_opt_einsum_contraction_schedule,
    get_trivial_contraction_schedule,
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
from .measure import (
    get_giga_op_map,
    get_footprint_gbytes,
    get_roofline_flop_rate,
    measure_giga_op_rate,
    stringify_comparison_vs_roofline,
    timeit,
    validate_batched_einsum_transform,
)
from .utils import IndexNameGenerator, get_tccg_benchmark

__version__ = "0.1.0"

__all__ = (
    "Array",
    "BatchedEinsum",
    "ContractionSchedule",
    "EinsumAxisAccess",
    "EinsumMatchError",
    "EinsumOperand",
    "EinsumProgram",
    "EinsumTunitMatchError",
    "FreeAxis",
    "IndexNameGenerator",
    "IntermediateResult",
    "InvalidParameterError",
    "NoDevicePeaksInfoError",
    "NoFactInDatabaseError",
    "ScheduleDescriptor",
    "SizeParam",
    "SummationAxis",
    "TransformValidationError",
    "array",
    "batched_einsum",
    "build_executable",
    "canonicalize_einsum",
    "einsum",
    "generate_program",
    "generate_program_with_opt_einsum_schedule",
    "get_footprint_gbytes",
    "get_giga_op_map",
    "get_opt_einsum_contraction_schedule",
    "get_roofline_flop_rate",
    "get_substitution_mapping_between_isomorphic_batched_einsums",
    "get_tccg_benchmark",
    "get_trivial_contraction_schedule",
    "measure_giga_op_rate",
    "stringify_comparison_vs_roofline",
    "timeit",
    "validate_batched_einsum_transform",
)
