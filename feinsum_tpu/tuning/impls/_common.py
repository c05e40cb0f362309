"""Shared helpers for the TPU schedule-space library."""

from __future__ import annotations

from feinsum_tpu.codegen.program import get_index_lengths
from feinsum_tpu.contraction_schedule import (
    get_opt_einsum_contraction_schedule,
    get_trivial_contraction_schedule,
)
from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.einsum import SizeParam

VMEM_BUDGET_BYTES = 100 * 1024 * 1024


def long_axis_of(einsum) -> str:
    params = [ix for ix, ln in einsum.index_to_dim_length.items()
              if isinstance(ln, SizeParam)]
    if len(params) != 1:
        raise InvalidParameterError(
            f"schedule space expects exactly one parametric axis, found"
            f" {params}")
    return params[0]


def guard_vmem(einsum, block_long: int, *, long_dim_length: int = 100_000
               ) -> None:
    from feinsum_tpu.ops.pallas_emitter import estimate_block_vmem_bytes
    lengths = get_index_lengths(einsum, long_dim_length)
    need = estimate_block_vmem_bytes(einsum, block_long, lengths)
    if need > VMEM_BUDGET_BYTES:
        raise InvalidParameterError(
            f"block_long={block_long} needs ~{need >> 20} MiB VMEM"
            f" (> {VMEM_BUDGET_BYTES >> 20} MiB)")


def fused_pallas_program(program, *, block_long: int, hoist: bool,
                         parallel_grid: bool = True, dofmajor: bool = False,
                         fold: bool = False, preblock: bool = False,
                         precision_3x: bool = False, **desc) -> object:
    """The core schedule of the DG family: (optionally) multi-step hoisted
    contraction, fully fused in VMEM, gridded over the long axis; *dofmajor*
    rotates long axes onto the dense lane dimension (~3x HBM throughput for
    short-dof operands, see ops/layouts.py); *fold* additionally stores the
    long axis as (8, E/8) so short-dof arrays tile HBM exactly (no 35->40
    sublane padding; +15% streaming, scripts/tpu_fold_probe*.py)."""
    e = program.einsum
    guard_vmem(e, block_long)
    schedule = (get_opt_einsum_contraction_schedule(e) if hoist
                else get_trivial_contraction_schedule(e))
    if dofmajor and "arg_layouts" not in desc:
        from feinsum_tpu.ops.layouts import dofmajor_layouts
        layouts, out_perm = dofmajor_layouts(e)
        desc["arg_layouts"] = layouts
        desc["out_layout"] = out_perm
    if fold:
        if not dofmajor:
            raise InvalidParameterError(
                "fold requires dofmajor (the long axis must be stored"
                " trailing)")
        desc["fold_long"] = 8
    if preblock:
        from feinsum_tpu.ops.layouts import preblock_small_args
        if not dofmajor:
            raise InvalidParameterError(
                "preblock requires dofmajor (the long axis must be stored"
                " trailing)")
        names = preblock_small_args(e)
        if not names:
            raise InvalidParameterError(
                "no argument qualifies for preblock (all streamed operands"
                " have >= 16 or 8-divisible sublane rows)")
        desc["preblock_args"] = names
    if precision_3x:
        desc["precision"] = "bf16_3x"
    return program.copy(schedule=schedule).with_descriptor(
        backend="pallas",
        block_long=block_long,
        dimension_semantics="parallel" if parallel_grid else "arbitrary",
        **desc)
