"""
Second-generation first-party Pallas tensor-contraction space: multi-axis
output grids with PER-GRID-AXIS BLOCK SIZES, an explicit in-kernel MXU row
(M) letter, and optional M-stacking of unrolled output slices.

Reference counterpart: the COGENT register-tiling spaces
(``tuning/impls/cogent.py:52-115`` and
``cogent_w_register_prftch_w_reg_tiling.py`` — output-axis tiling sizes x
permutation choices).  tc_pallas_v0 measured 12-30x behind tc_gemm_v0 on
the TCCG shapes because (a) each grid cell covered ONE index of every
gridded axis and (b) with no designated row axis the kernel lowering never
emitted an MXU dot at all (every in-cell contraction ran as VPU
broadcast-sums).  This space fixes both: a cell covers a *block* of each
gridded axis, one output letter is routed to the lowering as the MXU M
axis (``descriptor.grid_m``), and ``descriptor.mstack`` stacks the
remaining unrolled output slices into M so the M-tile fill approaches the
N*K bound (tccg_02: per-a dots of M=296 -> one M=block_a*296 dot; the
predicted ceiling moves from ~12% to ~15% MXU fill = the 151 us bandwidth
floor).

Tuned choices: how many leading output axes to grid over, the block size
of the first two gridded axes (divisor grids), which output letter is M,
M-stacking, and the MXU precision.
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

_PRECISIONS = ("default", "bf16_3x")
_MAX_BODY_COMBOS = 512          # compile-time guard (Mosaic unrolled body)


def _max_grid_axes(e) -> int:
    return max(1, len(e.out_idx_set) - 2)


def _divisors(n: int) -> list:
    return [d for d in range(1, n + 1) if n % d == 0]


@transform_param("n_grid", lambda e: IntParameter(1, _max_grid_axes(e)))
@transform_param("blk0_idx", lambda e: IntParameter(0, 9))
@transform_param("blk1_idx", lambda e: IntParameter(0, 9))
@transform_param("m_pos",
                 lambda e: IntParameter(0, len(e.out_idx_set) - 1))
@transform_param("mstack", lambda e: BoolParameter())
@transform_param("precision_idx",
                 lambda e: IntParameter(0, len(_PRECISIONS) - 1))
@transform_param("use_opt_path", lambda e: BoolParameter())
def transform(program, n_grid, blk0_idx, blk1_idx, m_pos, mstack,
              precision_idx, use_opt_path):
    e = program.einsum
    if e.b != 1 or e.all_size_params or len(e.out_idx_set) < 3:
        raise InvalidParameterError(
            "tc_pallas_v1 expects a dense single-row contraction with a"
            " rank>=3 output (rank-2 GEMMs belong to XLA)")
    if any(isinstance(ln, SizeParam) for ln in
           e.index_to_dim_length.values()):
        raise InvalidParameterError("concrete axes only")
    lengths = {ix: int(ln) for ix, ln in e.index_to_dim_length.items()}

    n_grid = min(int(n_grid), _max_grid_axes(e))
    grid_letters = tuple(e.out_idx_set[:n_grid])

    # per-grid-axis blocks for the first two gridded letters (divisor grid)
    grid_blocks = []
    for i, idx in enumerate((blk0_idx, blk1_idx)):
        if i >= len(grid_letters):
            break
        divs = _divisors(lengths[grid_letters[i]])
        blk = divs[min(int(idx), len(divs) - 1)]
        if blk > 1:
            grid_blocks.append((grid_letters[i], blk))
    blocks = dict(grid_blocks)

    cell_len = {ix: (blocks.get(ix, 1) if ix in grid_letters else ln)
                for ix, ln in lengths.items()}

    m = e.out_idx_set[int(m_pos)]
    if cell_len[m] <= 1:
        raise InvalidParameterError(
            f"M letter {m!r} has in-cell extent {cell_len[m]}")
    # the lane (N) axis the lowering will pick: largest in-cell output
    # letter != m that can be an array dim (gridded letters are stored
    # leading, hence always unrolled); the K axis: largest contracted letter
    n_pool = [l for l in e.out_idx_set
              if l != m and l not in grid_letters and cell_len[l] > 1]
    if not n_pool:
        raise InvalidParameterError("no lane-axis candidate besides M")
    n = max(n_pool, key=lambda l: cell_len[l])
    contracted = [l for l in lengths if l not in e.out_idx_set]
    if not contracted:
        raise InvalidParameterError("pure expansions belong to tc_gemm_v0")
    k = max(contracted, key=lambda l: lengths[l])

    # storage contracts: grid letters lead (Mosaic last-two-dims rule —
    # a gridded letter in an operand's last-two stored dims makes its block
    # end in a non-tile-aligned dim, the v0 live crash class, 3abad6a);
    # then the unrolled letters; then M; then the operand's dot axis (K, or
    # N for k-free operands) trailing so rep_from_block keeps {M, trailing}
    # as the array dims the step lowering expects.
    arg_layouts = []
    stored_orders = []
    for pos, idx_set in enumerate(e.in_idx_sets):
        letters = tuple(idx_set)
        carried = [l for l in (m, k, n) if l in letters]
        if set(carried) == {m, k, n}:
            raise InvalidParameterError(
                f"operand {pos} carries M, K and N ({m},{k},{n}); one of"
                " them would lower to an unrolled loop")
        # a blocked-grid M stays LEADING (rep_from_block keeps the row
        # letter as an array dim regardless of position; trailing would
        # break the Mosaic last-two rule)
        trailing = [l for l in (m,) if l in letters
                    and l not in grid_letters]
        second = (k if k in letters else (n if n in letters else None))
        if second is not None:
            trailing.append(second)
        if k in letters and n in letters and m not in trailing:
            trailing = [k, n]          # both array dims, no m
        lead = [l for l in grid_letters if l in letters
                and l not in trailing]
        mid = [l for l in letters
               if l not in trailing and l not in lead]
        order = lead + mid + trailing
        stored_orders.append(order)
        if len(order) >= 2 and any(l in grid_letters
                                   for l in order[-2:]):
            raise InvalidParameterError(
                f"operand {pos}: a gridded letter lands in the last-two"
                " stored dims (Mosaic block rule)")
        perm = tuple(letters.index(l) for l in order)
        if perm != tuple(range(len(letters))):
            arg_layouts.append((e.args[0][pos].name, perm))

    # the output block: gridded letters lead by construction; its last-two
    # dims must be non-gridded full axes
    if any(l in grid_letters for l in e.out_idx_set[-2:]):
        raise InvalidParameterError(
            "a gridded letter is one of the output's last-two stored dims")

    # unrolled-body size (compile-time) guard: everything outside {m,n,k}
    combos = 1
    for ix, ln in cell_len.items():
        if ix not in (m, n, k):
            combos *= ln
    if combos > _MAX_BODY_COMBOS:
        raise InvalidParameterError(
            f"cell unrolls {combos} slices (> {_MAX_BODY_COMBOS})")

    # VMEM guard: double-buffered operand+output tiles (T(8,128)-padded on
    # the last-two stored dims) + the mstack concat copy
    def _tiled_bytes(dims, itemsize):
        dims = list(dims)
        if len(dims) >= 1:
            dims[-1] = -(-dims[-1] // 128) * 128
        if len(dims) >= 2:
            dims[-2] = -(-dims[-2] // 8) * 8
        tot = itemsize
        for d in dims:
            tot *= d
        return tot

    total = 0
    for pos, order in enumerate(stored_orders):
        arg = e.args[0][pos]
        total += 2 * _tiled_bytes([cell_len[l] for l in order],
                                  arg.dtype.itemsize)
    total += 2 * _tiled_bytes([cell_len[l] for l in e.out_idx_set], 4)
    if mstack:
        melt = cell_len[m] + ((-cell_len[m]) % 8)
        total += 4 * melt * combos * cell_len[k]
    vmem_limit = 100 * 1024 * 1024
    if total > int(0.8 * vmem_limit):
        raise InvalidParameterError(
            f"cell tiles want ~{total >> 20} MiB"
            f" (> 80% of {vmem_limit >> 20} MiB VMEM)")

    schedule = (get_opt_einsum_contraction_schedule(e) if use_opt_path
                else get_trivial_contraction_schedule(e))
    return program.copy(
        schedule=schedule,
        descriptor=ScheduleDescriptor(
            backend="pallas",
            grid_index=grid_letters,
            grid_blocks=tuple(grid_blocks),
            grid_m=m,
            mstack=bool(mstack),
            arg_layouts=tuple(arg_layouts),
            precision=_PRECISIONS[precision_idx],
            vmem_limit_bytes=vmem_limit,
            dimension_semantics="parallel"))


if __name__ == "__main__":
    import sys

    import feinsum_tpu as f
    from feinsum_tpu.tuning import autotune

    case = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    einsum = f.get_tccg_benchmark(case, dtype="float32")
    autotune(einsum, __file__, stop_after=secs, long_dim_length=100)
