"""
Schedule space for bandwidth-bound kernels over one long axis: copies
``ij,ij->ij``, row sums ``ij->i``, matvec ``ij,j->i``, per-element scaling.

Reference counterpart: ``tuning/impls/ij_ij_to_ij.py`` / ``ij_to_i.py`` /
``ij_j_to_i.py`` (plain split_iname work division).
"""

from __future__ import annotations

from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import fused_pallas_program


@transform_param("log2_block", lambda e: IntParameter(8, 16))
@transform_param("flatten", lambda e: BoolParameter())
@transform_param("parallel_grid", lambda e: BoolParameter())
def transform(program, log2_block, flatten, parallel_grid):
    return fused_pallas_program(
        program, block_long=2 ** log2_block, hoist=False,
        parallel_grid=parallel_grid, flatten=flatten)


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.einsum("ij,ij->ij",
                      f.array("A", ("E", 35), "float32"),
                      f.array("B", ("E", 35), "float32"))
    autotune(einsum, __file__, stop_after=120)
