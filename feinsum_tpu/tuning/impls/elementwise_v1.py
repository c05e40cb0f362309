"""
Schedule space for bandwidth-bound kernels over one long axis — v1 adds the
dof-major layout knob (XLA:TPU tiles (E, ndof) HBM arrays to (8,128),
padding short lane dims ~3.7x; rotating the long axis onto lanes recovers
it).  Supersedes the retired elementwise_v0 (no archived fact ever referenced it).
"""

from __future__ import annotations

from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import fused_pallas_program


@transform_param("log2_block", lambda e: IntParameter(8, 18))
@transform_param("blkc128", lambda e: IntParameter(0, 32))
@transform_param("dofmajor", lambda e: BoolParameter())
@transform_param("fold", lambda e: BoolParameter())
@transform_param("flatten", lambda e: BoolParameter())
@transform_param("parallel_grid", lambda e: BoolParameter())
@transform_param("vmem_idx", lambda e: IntParameter(0, 2))
def transform(program, log2_block, blkc128=0, *, dofmajor, flatten,
              parallel_grid, fold=False, vmem_idx=None):
    from feinsum_tpu.tuning.impls._common import resolve_block
    return fused_pallas_program(
        program, block_long=resolve_block(log2_block, blkc128), hoist=False,
        parallel_grid=parallel_grid, dofmajor=dofmajor, fold=fold,
        flatten=flatten, vmem_idx=vmem_idx)


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.einsum("ij,ij->ij",
                      f.array("A", ("E", 35), "float32"),
                      f.array("B", ("E", 35), "float32"))
    autotune(einsum, __file__, stop_after=300, long_dim_length=1_000_000)
