"""
Schedule space for the DG divergence family ``xre,rij,xej->ei`` /
``es,sij,ej->ei`` (batched or single-output).

Reference counterpart: ``tuning/impls/xre_rij_xej_to_ei*.py`` /
``batched_xre_rij_xej_to_ei.py`` (split element axis, hoist the
Jacobian-contraction into LOCAL memory, prefetch the reference matrix).  On
TPU the same three decisions are: long-axis block size (grid split), whether
to run the hoisted multi-step schedule (the Sum_x J*u factorization becomes a
*schedule* choice), and the grid's dimension semantics.
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

    ndof = 35
    einsum = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(j, ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array(u, ("E", ndof), "float32")]
         for j, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
    autotune(einsum, __file__, stop_after=300)
