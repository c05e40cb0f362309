"""
TTGT schedule space, v1: layout permutations as STRUCTURED
:class:`PermutationParameter` knobs (VERDICT r2 missing #3).

``ttgt_v0`` encodes each permutation as an index into ``rank!`` — its
mutation steps to unrelated permutations, so the hill-climb half of the
search degenerates to random on those knobs.  v1's values are the tuples
themselves and mutation swaps two axes, the same structured-tuple search
the reference runs (``tuning/impls/ttgt.py:52-114``).  v0 stays shipped so
its archived facts keep replaying; new tuning rounds prefer v1.
"""

from __future__ import annotations

from feinsum_tpu.codegen.descriptor import ScheduleDescriptor
from feinsum_tpu.contraction_schedule import get_trivial_contraction_schedule
from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.tuning import (
    IntParameter,
    PermutationParameter,
    transform_param,
)
from feinsum_tpu.tuning.impls.ttgt_v0 import _canon_rank, _natural_out_perm

_PRECISIONS = ("default", "highest", "bf16_3x")


@transform_param("layout_a",
                 lambda e: PermutationParameter(_canon_rank(e, 0)))
@transform_param("layout_b",
                 lambda e: PermutationParameter(_canon_rank(e, 1)))
@transform_param("layout_out",
                 lambda e: PermutationParameter(len(e.out_idx_set)))
@transform_param("precision_idx",
                 lambda e: IntParameter(0, len(_PRECISIONS) - 1))
@transform_param("natural_out", lambda e: IntParameter(0, 1))
def transform(program, layout_a, layout_b, layout_out, precision_idx,
              natural_out=0):
    from feinsum_tpu.canonicalization import canonical_operand_positions

    e = program.einsum
    if e.n != 2 or e.b != 1 or e.all_size_params:
        raise InvalidParameterError(
            "ttgt_v1 expects a dense 2-operand single-row contraction")
    # permutations are archived against CANONICAL operand positions and
    # routed onto the user's positions (see ttgt_v0.transform's replay
    # notes; the same canonical_operand_positions contract applies)
    pos_a, pos_b = canonical_operand_positions(e)
    pa = tuple(int(p) for p in layout_a)
    pb = tuple(int(p) for p in layout_b)
    if len(pa) != len(e.in_idx_sets[pos_a]) \
            or len(pb) != len(e.in_idx_sets[pos_b]):
        raise InvalidParameterError(
            "ttgt_v1: permutation rank does not match the operand")
    layouts = (
        (e.args[0][pos_a].name, pa),
        (e.args[0][pos_b].name, pb),
    )
    if natural_out:
        out_perm = _natural_out_perm(e, pos_a, pos_b, pa, pb)
    else:
        out_perm = tuple(int(p) for p in layout_out)
    return program.copy(
        schedule=get_trivial_contraction_schedule(e),
        descriptor=ScheduleDescriptor(
            backend="xla",
            precision=_PRECISIONS[precision_idx],
            arg_layouts=layouts,
            out_layout=out_perm))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.get_tccg_benchmark(3, dtype="float32")
    autotune(einsum, __file__, stop_after=300, long_dim_length=100)
