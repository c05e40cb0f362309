"""
Schedule space for 3-D curl / cross-product batched einsums — b=3 output
rows, each contracting a rotated pairing of geometry and dof operands
(e.g. ``(curl u)_x = Σ_r J_y·D_r·u_z − J_z·D_r·u_y`` expressed as two
batched-einsum rows per component).

Reference counterpart: ``tuning/impls/re_rji_ej_to_ei_3d_cross_product_v0.py``
(which needs accumulator init/assign-id surgery on the loopy kernel,
``:12-40``).  Here multi-row accumulation is native to the emitter (every
batch row lowers inside one fused kernel and rows sharing operands CSE), so
the space is the DG-family descriptor space; the file exists so curl-class
facts carry their own transform_id in the archive.
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
@transform_param("prereduce", lambda e: BoolParameter())
@transform_param("hoist", lambda e: BoolParameter())
@transform_param("parallel_grid", lambda e: BoolParameter())
@transform_param("vmem_idx", lambda e: IntParameter(0, 2))
@transform_param("split_rows", lambda e: _maybe_bool(e.b > 1))
@transform_param("accum_f32", lambda e: _maybe_bool(
    any(dt.itemsize < 4 for dt in e.arg_to_dtype.values())))
@transform_param("host_hoist", lambda e: BoolParameter())
def transform(program, log2_block, blkc128=0, *, dofmajor, hoist, parallel_grid,
              fold=False, preblock=False, precision_3x=False, jfold=False,
              prereduce=False, vmem_idx=None, split_rows=False,
              accum_f32=False, host_hoist=True):
    return fused_pallas_program(
        program, block_long=resolve_block(log2_block, blkc128), hoist=hoist,
        parallel_grid=parallel_grid, dofmajor=dofmajor, fold=fold,
        preblock=preblock, precision_3x=precision_3x, jfold=jfold,
        prereduce=prereduce, vmem_idx=vmem_idx, split_rows=bool(split_rows),
        accum_f32=bool(accum_f32), host_hoist=bool(host_hoist))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    ndof = 35
    # (curl u) component rows: J_a (E,) per-element geometry factor,
    # D (3, ndof, ndof) reference derivatives, u_b (E, ndof) dofs
    einsum = f.batched_einsum(
        "e,rij,ej->ei",
        [[f.array(j, ("E",), "float32"),
          f.array("D", (3, ndof, ndof), "float32"),
          f.array(u, ("E", ndof), "float32")]
         for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])
    autotune(einsum, __file__, stop_after=300)
