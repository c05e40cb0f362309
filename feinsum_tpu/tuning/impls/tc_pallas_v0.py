"""
First-party Pallas schedule space for dense 2-operand tensor contractions:
grid over leading output axes, one output tile per grid cell, computed by
the Rep lowering (MXU dots over the trailing axes, tiny axes unrolled) and
written in place.

Reference counterpart: the COGENT space (``tuning/impls/cogent.py:52-115``,
output-axis-permutation x tile-size choices).  XLA's own MXU tiling wins on
big GEMM-able contractions (TCCG #12 measures 95% of the 3-pass f32 peak),
but on expansion-heavy cases with high-rank outputs it materializes the
output through transposes (TCCG #35: ~5% of the bandwidth roofline); this
space targets those.  Tuned choices: how many leading output axes to grid
over, the contraction path, and the MXU precision.
"""

from __future__ import annotations

from feinsum_tpu.codegen.descriptor import ScheduleDescriptor
from feinsum_tpu.contraction_schedule import (
    get_opt_einsum_contraction_schedule,
    get_trivial_contraction_schedule,
)
from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.einsum import SizeParam
from feinsum_tpu.tuning import BoolParameter, IntParameter, transform_param
from feinsum_tpu.tuning.impls._common import VMEM_BUDGET_BYTES

_PRECISIONS = ("default", "bf16_3x")


def _max_grid_axes(e) -> int:
    return max(1, len(e.out_idx_set) - 2)


@transform_param("n_grid", lambda e: IntParameter(1, _max_grid_axes(e)))
@transform_param("precision_idx",
                 lambda e: IntParameter(0, len(_PRECISIONS) - 1))
@transform_param("use_opt_path", lambda e: BoolParameter())
def transform(program, n_grid, precision_idx, use_opt_path):
    e = program.einsum
    if e.b != 1 or e.all_size_params or len(e.out_idx_set) < 3:
        raise InvalidParameterError(
            "tc_pallas_v0 expects a dense single-row contraction with a"
            " rank>=3 output (rank-2 GEMMs belong to XLA)")
    if any(isinstance(ln, SizeParam) for ln in
           e.index_to_dim_length.values()):
        raise InvalidParameterError("concrete axes only")
    n_grid = min(int(n_grid), _max_grid_axes(e))
    grid_letters = tuple(e.out_idx_set[:n_grid])

    # VMEM guard: per-cell blocks of every operand + the output tile
    lengths = {ix: int(ln) for ix, ln in e.index_to_dim_length.items()}
    total = 0
    for row in e.args:
        for arg, idx_set in zip(row, e.in_idx_sets):
            size = 1
            for ix in idx_set:
                size *= 1 if ix in grid_letters else lengths[ix]
            total += 2 * size * arg.dtype.itemsize
    out_size = 1
    for ix in e.out_idx_set:
        out_size *= 1 if ix in grid_letters else lengths[ix]
    total += 4 * out_size * 4
    if total > VMEM_BUDGET_BYTES:
        raise InvalidParameterError(
            f"grid over {grid_letters} leaves ~{total >> 20} MiB tiles"
            f" (> {VMEM_BUDGET_BYTES >> 20} MiB VMEM)")

    # unroll guard: with no long axis, the Rep lowering keeps ONE output
    # lane axis + at most one MXU k; every other non-grid axis unrolls into
    # static slices, which is unbuildable past MAX_UNROLL_COMBOS (and slow
    # to compile well before that).  Conservative estimate: everything but
    # the largest non-grid output axis and the largest contracted axis.
    non_grid_out = sorted((lengths[ix] for ix in e.out_idx_set
                           if ix not in grid_letters), reverse=True)
    contracted = sorted((lengths[ix] for ix in e.index_to_dim_length
                         if ix not in e.out_idx_set), reverse=True)
    combos = 1
    for ln in non_grid_out[1:] + contracted[1:]:
        combos *= ln
    if combos > 768:
        raise InvalidParameterError(
            f"grid over {grid_letters} leaves ~{combos} unrolled slices")

    # Mosaic block rule (every K-promotion point 500'd live 2026-08-19):
    # a gridded letter among an operand's last-two STORED dims makes the
    # block's trailing shape (..., 1) — neither 8/128-divisible nor equal
    # to the array dim.  Store gridded letters LEADING in every operand
    # (the grid then slices leading axes and the trailing tile stays the
    # full array dims, always legal); the output already leads with the
    # grid letters by construction.
    arg_layouts = []
    for pos, idx_set in enumerate(e.in_idx_sets):
        if not any(l in grid_letters for l in idx_set):
            continue
        non_grid = [l for l in idx_set if l not in grid_letters]
        if len(non_grid) < 2:
            raise InvalidParameterError(
                f"operand {pos} has {len(non_grid)} non-gridded axes; its"
                " Pallas block would end in a 1-sized trailing dim"
                " (Mosaic last-two-dims rule)")
        perm = tuple([idx_set.index(l) for l in idx_set
                      if l in grid_letters]
                     + [idx_set.index(l) for l in non_grid])
        if perm != tuple(range(len(idx_set))):
            arg_layouts.append((e.args[0][pos].name, perm))

    schedule = (get_opt_einsum_contraction_schedule(e) if use_opt_path
                else get_trivial_contraction_schedule(e))
    return program.copy(
        schedule=schedule,
        descriptor=ScheduleDescriptor(
            backend="pallas",
            grid_index=grid_letters,
            arg_layouts=tuple(arg_layouts),
            precision=_PRECISIONS[precision_idx],
            dimension_semantics="parallel"))


if __name__ == "__main__":
    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    einsum = f.get_tccg_benchmark(35, dtype="float32")
    autotune(einsum, __file__, stop_after=600, long_dim_length=100)
