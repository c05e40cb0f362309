"""
Schedule space for the DG face-mass / lift family ``ifj,fe,fej->ei``.

Reference counterpart: ``tuning/impls/ifj_fe_fej_to_ei*.py`` (gather-heavy,
per-face unroll).  On TPU the tiny face axis ``f`` unrolls inside the kernel
automatically (it is a small axis in the lowering), so the space is the same
block/hoist/semantics trio.
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

    einsum = f.einsum("ifj,fe,fej->ei",
                      f.array("L", (35, 4, 15), "float32"),
                      f.array("F", (4, "E"), "float32"),
                      f.array("uf", (4, "E", 15), "float32"))
    autotune(einsum, __file__, stop_after=300)
