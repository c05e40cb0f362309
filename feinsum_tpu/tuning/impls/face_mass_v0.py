"""
Schedule space for the DG face-mass / lift family ``ifj,fe,fej->ei``.

Reference counterpart: ``tuning/impls/ifj_fe_fej_to_ei*.py`` (gather-heavy,
per-face unroll).  On TPU the tiny face axis ``f`` unrolls inside the kernel
automatically (it is a small axis in the lowering), so the space is the same
block/hoist/semantics trio.
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
def transform(program, log2_block, blkc128=0, *, dofmajor, hoist, parallel_grid,
              fold=False, preblock=False, precision_3x=False, jfold=False,
              vmem_idx=None, split_rows=False, accum_f32=False,
              host_hoist=True):
    return fused_pallas_program(
        program, block_long=resolve_block(log2_block, blkc128), hoist=hoist,
        parallel_grid=parallel_grid, dofmajor=dofmajor, fold=fold,
        preblock=preblock, precision_3x=precision_3x, jfold=jfold,
        vmem_idx=vmem_idx, split_rows=bool(split_rows),
        accum_f32=bool(accum_f32), host_hoist=bool(host_hoist))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.einsum("ifj,fe,fej->ei",
                      f.array("L", (35, 4, 15), "float32"),
                      f.array("F", (4, "E"), "float32"),
                      f.array("uf", (4, "E", 15), "float32"))
    autotune(einsum, __file__, stop_after=300)
