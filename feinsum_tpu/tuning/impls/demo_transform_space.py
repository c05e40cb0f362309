"""
Minimal demo of the decorator protocol (reference:
``tuning/impls/demo_transform_space.py``, embedded in
doc/perf_engg_tutorial.rst): a batched matmul whose only knobs are the
long-axis block size and the grid semantics.
"""

from __future__ import annotations

from feinsum_tpu.tuning import IntParameter, einsum_arg, transform_param
from feinsum_tpu.tuning.impls._common import fused_pallas_program, long_axis_of


@transform_param("log2_block", lambda e: IntParameter(8, 13))
@einsum_arg("long_axis", long_axis_of)
def transform(program, long_axis, log2_block):
    return fused_pallas_program(
        program, block_long=2 ** log2_block, hoist=False,
        grid_index=long_axis)


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.einsum("ij,ejk->eik",
                      f.array("A", (35, 35), "float64"),
                      f.array("B", ("E", 35, 35), "float64"))
    autotune(einsum, __file__, stop_after=60)
