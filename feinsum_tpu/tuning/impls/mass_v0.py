"""
Schedule space for the mass-matrix family ``e,ij,ej->ei`` and the
per-element matvec ``ij,ej->ei``.

Reference counterpart: ``tuning/impls/e_ij_ej_to_ei_no_prftch.py`` /
``ij_ej_to_ei_no_prftch.py``.
"""

from __future__ import annotations

from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import fused_pallas_program, resolve_block


def _maybe_bool(cond):
    return BoolParameter() if cond else IntParameter(0, 0)


# block cap 2^18 (was 2^16): the matvec class keeps gaining from bigger
# fold blocks through b15-b16 (scripts/tpu_grad3_probe.py / tpu_mfold_probe)
@transform_param("log2_block", lambda e: IntParameter(8, 18))
@transform_param("blkc128", lambda e: IntParameter(0, 32))
@transform_param("dofmajor", lambda e: BoolParameter())
@transform_param("fold", lambda e: BoolParameter())
@transform_param("preblock", lambda e: BoolParameter())
@transform_param("precision_3x", lambda e: BoolParameter())
@transform_param("parallel_grid", lambda e: BoolParameter())
@transform_param("vmem_idx", lambda e: IntParameter(0, 2))
@transform_param("split_rows", lambda e: _maybe_bool(e.b > 1))
@transform_param("accum_f32", lambda e: _maybe_bool(
    any(dt.itemsize < 4 for dt in e.arg_to_dtype.values())))
def transform(program, log2_block, blkc128=0, *, dofmajor, parallel_grid, fold=False,
              preblock=False, precision_3x=False, vmem_idx=None,
              split_rows=False, accum_f32=False):
    return fused_pallas_program(
        program, block_long=resolve_block(log2_block, blkc128), hoist=False,
        parallel_grid=parallel_grid, dofmajor=dofmajor, fold=fold,
        preblock=preblock, precision_3x=precision_3x, vmem_idx=vmem_idx,
        split_rows=bool(split_rows), accum_f32=bool(accum_f32))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    ndof = 35
    einsum = f.einsum("e,ij,ej->ei",
                      f.array("jac", ("E",), "float32"),
                      f.array("M", (ndof, ndof), "float32"),
                      f.array("u", ("E", ndof), "float32"))
    autotune(einsum, __file__, stop_after=120)
