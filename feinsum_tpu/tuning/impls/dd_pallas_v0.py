"""
Schedule space for fp64 DG-family einsums via the double-double Pallas
kernel (ops/dd_emitter.py) — the first-party alternative to the XLA f64
emulation route (xla_v0 with log2_chunk), whose HBM-thrashing decomposition
measured 9.6 GOp/s chunked on v5e (CLAUDE.md round-2 findings; VERDICT r2
next #7 asked for one honest first-party attempt).

The kernel keeps f32-pair arithmetic fused in VMEM: ~24 VPU ops per dd-MAC
but zero HBM temporaries.  Reference counterpart: the fp64 rows of
tuning/impls/xre_rij_xej_to_ei*.py / e_ij_ej_to_ei*.py (the reference's
entire archive is fp64).
"""

from __future__ import annotations

from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import (
    VMEM_MB_CHOICES,
    guard_vmem,
    resolve_block,
)


@transform_param("log2_block", lambda e: IntParameter(8, 15))
@transform_param("blkc128", lambda e: IntParameter(0, 16))
@transform_param("parallel_grid", lambda e: BoolParameter())
@transform_param("vmem_idx", lambda e: IntParameter(0, 2))
def transform(program, log2_block, blkc128=0, *, parallel_grid=True,
              vmem_idx=2):
    from feinsum_tpu.ops.dd_emitter import _recognize_row
    from feinsum_tpu.ops.layouts import dofmajor_layouts

    e = program.einsum
    if any(dt.itemsize != 8 for dt in e.arg_to_dtype.values()):
        raise InvalidParameterError(
            "dd_pallas_v0 is the fp64 space (use the f32 DG spaces"
            " otherwise)")
    for row in e.args:
        _recognize_row(e, row)       # raises when the family doesn't match
    block = resolve_block(log2_block, blkc128)
    guard_vmem(e, block)
    layouts, out_perm = dofmajor_layouts(e)
    return program.with_descriptor(
        backend="pallas",
        dd_pairs=True,
        block_long=block,
        arg_layouts=layouts,
        out_layout=out_perm,
        dimension_semantics="parallel" if parallel_grid else "arbitrary",
        vmem_limit_bytes=VMEM_MB_CHOICES[int(vmem_idx)] * 2 ** 20)


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    ndof = 35
    einsum = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(j, ("E", 3), "float64"),
          f.array("R", (3, ndof, ndof), "float64"),
          f.array(u, ("E", ndof), "float64")]
         for j, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
    autotune(einsum, __file__, stop_after=600)
