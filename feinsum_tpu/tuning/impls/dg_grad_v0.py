"""
Schedule space for the DG gradient family ``xre,rij,ej->xei`` (and the
2-operand ``re,rij,ej->ei`` variants).

Reference counterpart: ``tuning/impls/xre_rij_ej_to_xei.py`` /
``re_rij_ej_to_ei*.py``.
"""

from __future__ import annotations

from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import fused_pallas_program


@transform_param("log2_block", lambda e: IntParameter(8, 16))
@transform_param("dofmajor", lambda e: BoolParameter())
@transform_param("fold", lambda e: BoolParameter())
@transform_param("preblock", lambda e: BoolParameter())
@transform_param("precision_3x", lambda e: BoolParameter())
@transform_param("jfold", lambda e: BoolParameter())
@transform_param("hoist", lambda e: BoolParameter())
@transform_param("parallel_grid", lambda e: BoolParameter())
def transform(program, log2_block, dofmajor, hoist, parallel_grid,
              fold=False, preblock=False, precision_3x=False, jfold=False):
    return fused_pallas_program(
        program, block_long=2 ** log2_block, hoist=hoist,
        parallel_grid=parallel_grid, dofmajor=dofmajor, fold=fold,
        preblock=preblock, precision_3x=precision_3x, jfold=jfold)


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    ndof = 35
    einsum = f.einsum("xre,rij,ej->xei",
                      f.array("J", (3, 3, "E"), "float32"),
                      f.array("D", (3, ndof, ndof), "float32"),
                      f.array("u", ("E", ndof), "float32"))
    autotune(einsum, __file__, stop_after=300)
