"""
Schedule space for the DG gradient family ``xre,rij,ej->xei`` (and the
2-operand ``re,rij,ej->ei`` variants).

Reference counterpart: ``tuning/impls/xre_rij_ej_to_xei.py`` /
``re_rij_ej_to_ei*.py``.
"""

from __future__ import annotations

from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import fused_pallas_program, resolve_block


def _maybe_bool(cond):
    return BoolParameter() if cond else IntParameter(0, 0)


@transform_param("log2_block", lambda e: IntParameter(8, 16))
@transform_param("blkc128", lambda e: IntParameter(0, 32))
@transform_param("dofmajor", lambda e: BoolParameter())
@transform_param("fold", lambda e: BoolParameter())
@transform_param("preblock", lambda e: BoolParameter())
@transform_param("precision_3x", lambda e: BoolParameter())
@transform_param("jfold", lambda e: BoolParameter())
@transform_param("hoist", lambda e: BoolParameter())
@transform_param("parallel_grid", lambda e: BoolParameter())
@transform_param("vmem_idx", lambda e: IntParameter(0, 2))
@transform_param("split_rows", lambda e: _maybe_bool(e.b > 1))
@transform_param("accum_f32", lambda e: _maybe_bool(
    any(dt.itemsize < 4 for dt in e.arg_to_dtype.values())))
@transform_param("host_hoist", lambda e: BoolParameter())
@transform_param("mfold", lambda e: BoolParameter())
def transform(program, log2_block, blkc128=0, *, dofmajor, hoist, parallel_grid,
              fold=False, preblock=False, precision_3x=False, jfold=False,
              vmem_idx=None, split_rows=False, accum_f32=False,
              host_hoist=True, mfold=False):
    return fused_pallas_program(
        program, block_long=resolve_block(log2_block, blkc128), hoist=hoist,
        parallel_grid=parallel_grid, dofmajor=dofmajor, fold=fold,
        preblock=preblock, precision_3x=precision_3x, jfold=jfold,
        vmem_idx=vmem_idx, split_rows=bool(split_rows),
        accum_f32=bool(accum_f32), host_hoist=bool(host_hoist),
        mfold=bool(mfold))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    ndof = 35
    einsum = f.einsum("xre,rij,ej->xei",
                      f.array("J", (3, 3, "E"), "float32"),
                      f.array("D", (3, ndof, ndof), "float32"),
                      f.array("u", ("E", ndof), "float32"))
    autotune(einsum, __file__, stop_after=300)
