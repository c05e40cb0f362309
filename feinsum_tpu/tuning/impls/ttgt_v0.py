"""
TTGT (Transpose-Transpose-GEMM-Transpose) schedule space for dense
2-operand tensor contractions.

Reference counterpart: ``tuning/impls/ttgt.py`` (tuned tile params for three
transpose kernels + a GEMM).  On TPU the GEMM and its MXU tiling belong to
XLA; the schedule choices that remain are the operand/output *layout
permutations* (which axes land on the MXU's contiguous dims — the "TT" and
the final "T") plus the contraction path and precision.
"""

from __future__ import annotations

import itertools

from feinsum_tpu.codegen.descriptor import ScheduleDescriptor
from feinsum_tpu.contraction_schedule import get_trivial_contraction_schedule
from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.tuning import IntParameter, einsum_arg, transform_param

_PRECISIONS = ("default", "highest", "bf16_3x")


def _n_perms(ndim: int) -> int:
    out = 1
    for k in range(2, ndim + 1):
        out *= k
    return out


def _perm(ndim: int, idx: int):
    perms = list(itertools.permutations(range(ndim)))
    return perms[idx % len(perms)]


@transform_param("perm_a", lambda e: IntParameter(
    0, _n_perms(len(e.in_idx_sets[0])) - 1))
@transform_param("perm_b", lambda e: IntParameter(
    0, _n_perms(len(e.in_idx_sets[1])) - 1 if e.n > 1 else 0))
@transform_param("perm_out", lambda e: IntParameter(
    0, _n_perms(len(e.out_idx_set)) - 1))
@transform_param("precision_idx",
                 lambda e: IntParameter(0, len(_PRECISIONS) - 1))
@einsum_arg("arg_names", lambda e: tuple(a.name for a in e.args[0]))
def transform(program, arg_names, perm_a, perm_b, perm_out, precision_idx):
    e = program.einsum
    if e.n != 2 or e.b != 1 or e.all_size_params:
        raise InvalidParameterError(
            "ttgt_v0 expects a dense 2-operand single-row contraction")
    layouts = (
        (arg_names[0], _perm(len(e.in_idx_sets[0]), perm_a)),
        (arg_names[1], _perm(len(e.in_idx_sets[1]), perm_b)),
    )
    return program.copy(
        schedule=get_trivial_contraction_schedule(e),
        descriptor=ScheduleDescriptor(
            backend="xla",
            precision=_PRECISIONS[precision_idx],
            arg_layouts=layouts,
            out_layout=_perm(len(e.out_idx_set), perm_out)))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.get_tccg_benchmark(3, dtype="float32")
    autotune(einsum, __file__, stop_after=300, long_dim_length=100)
