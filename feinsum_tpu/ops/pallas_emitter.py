"""
Pallas emitter: lower an :class:`EinsumProgram` to one fused TPU kernel.

Design (TPU-first, no loopy analog):

* The parametric "long" axis (DG element axis; reference Def. S in
  doc/design.rst, tuned at long_dim_length=100_000) becomes the Pallas grid.
  Operands carrying it stream HBM->VMEM block by block; operands without it
  (the small reference matrices) keep a constant block index, so Mosaic
  leaves them resident in VMEM across the whole grid — the TPU equivalent of
  the reference's LOCAL-memory prefetch of ``D`` (e.g.
  tuning/impls/xre_rij_xej_to_ei_v4.py steps 4-6).
* ALL schedule steps are evaluated inside the kernel on the current block:
  multi-step (hoisted) schedules never materialize intermediates in HBM —
  where the reference writes GLOBAL temporaries (codegen/loopy.py:263-273),
  we hold them in VMEM/registers.  This is the main HBM-traffic win.
* If the long axis is *contracted*, the grid becomes a reduction: the output
  block index is constant and the kernel accumulates with an init on the
  first grid step ("arbitrary" dimension semantics).
* Everything else (step algebra) is expressed with jnp.einsum on VMEM
  blocks, which Mosaic lowers to MXU dot_generals + VPU ops.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..diagnostics import InvalidParameterError
from ..einsum import SizeParam


def _on_tpu() -> bool:
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_grid_index(program, index_to_length) -> Optional[str]:
    """The axis to grid over: descriptor override, else the unique SizeParam
    axis, else the longest axis; None if nothing is long enough to block."""
    desc = program.descriptor
    e = program.einsum
    if desc.grid_index is not None:
        return desc.grid_index
    params = [ix for ix, ln in e.index_to_dim_length.items()
              if isinstance(ln, SizeParam)]
    if len(params) == 1:
        return params[0]
    if len(params) > 1:
        # prefer a parametric *output* axis (independent blocks)
        out_params = [ix for ix in e.out_idx_set if ix in params]
        return (out_params or params)[0]
    # fully concrete einsum: grid over the longest free axis if it's big
    candidates = sorted(e.out_idx_set,
                        key=lambda ix: -index_to_length[ix])
    if candidates and index_to_length[candidates[0]] >= 2 * 1024:
        return candidates[0]
    return None


def _arg_index_sets(einsum) -> dict:
    out = {}
    for row in einsum.args:
        for arg, idx_set in zip(row, einsum.in_idx_sets):
            out[arg.name] = idx_set
    return out


def _padded_block_bytes(dims, itemsize: int = 4) -> int:
    """Physical VMEM bytes of a block with in-kernel shape *dims*: the
    trailing (lane) dim pads to a multiple of 128 and the second-to-last
    (sublane) to a multiple of 8 — the T(8,128) register tiling.  A
    (B, 48) f32 block holds (B, 128) physically: ignoring this is how
    blkc128>=20 lane_pack points passed the old guard yet blew past
    vmem_limit_bytes and crashed Mosaic (HTTP 500, observed r4 live)."""
    dims = list(dims)
    if dims:
        dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // 8) * 8
    size = itemsize
    for d in dims:
        size *= d
    return size


def schedule_intermediates_vmem_bytes(einsum, schedule, block_long: int,
                                      grid_index: Optional[str] = None,
                                      index_to_length: Optional[dict] = None
                                      ) -> int:
    """Per-grid-step VMEM held by a schedule's intermediate (non-final)
    step outputs, f32, lane/sublane-padded, all assumed live at once
    (conservative: the last step of e.g. the lane_pack 3-step schedule
    consumes V and W together).  The generic
    :func:`estimate_block_vmem_bytes` assumes one OUTPUT-sized working
    set — rewrite-built schedules (lane_pack DG) carry intermediates with
    MORE axes than the output (V is (m..., el, i) vs out (chi..., el, i))."""
    if grid_index is None:
        from ..einsum import SizeParam
        params = [ix for ix, ln in einsum.index_to_dim_length.items()
                  if isinstance(ln, SizeParam)]
        grid_index = params[0] if params else None
    if index_to_length is None:
        index_to_length = {ix: ln for ix, ln
                           in einsum.index_to_dim_length.items()
                           if not hasattr(ln, "name")}   # concrete only
    total = 0
    for subs_ in schedule.subscripts[:-1]:
        out = subs_.split("->")[1]
        # lengths come from the caller's dict (param axes substituted);
        # int() on a raw SizeParam would raise TypeError THROUGH the
        # guard instead of InvalidParameterError (review r4 #5)
        dims = [(block_long if ix == grid_index
                 else int(index_to_length[ix])) for ix in out]
        total += _padded_block_bytes(dims)
    return total * einsum.b


def estimate_block_vmem_bytes(einsum, block_long: int,
                              index_to_length: dict,
                              grid_index: Optional[str] = None,
                              schedule=None,
                              split_rows: bool = False) -> int:
    """Rough per-grid-step VMEM demand of the fused kernel: double-buffered
    streaming blocks + resident operands + output blocks + one intermediate
    working set.  Used by schedule spaces as their InvalidParameterError
    guard (the TPU analog of the reference impls' shared-mem <= 48 kB
    checks, e.g. cogent.py:16-18).  With *schedule*, the one-working-set
    assumption is replaced by the schedule's actual intermediate sizes
    (see :func:`schedule_intermediates_vmem_bytes`).  With *split_rows*
    (multiple_results_in_one_kernel=False), each batch row runs its own
    kernel: residents (shared names) count once, but streamed operands,
    outputs and intermediates are per-row (max over rows)."""
    lengths = dict(index_to_length)
    if grid_index is None:
        from ..einsum import SizeParam
        params = [ix for ix, ln in einsum.index_to_dim_length.items()
                  if isinstance(ln, SizeParam)]
        grid_index = params[0] if params else None
    padded = schedule is not None    # rewrite-built paths: physical tiling

    def block_bytes(idx_set, itemsize):
        dims = [block_long if ix == grid_index else lengths[ix]
                for ix in idx_set]
        if padded:
            return _padded_block_bytes(dims, itemsize)
        size = itemsize
        for d in dims:
            size *= d
        return size

    arg_info = {}      # name -> (bytes, streamed?, rows using it)
    for r, row in enumerate(einsum.args):
        for arg, idx_set in zip(row, einsum.in_idx_sets):
            if arg.name in arg_info:
                arg_info[arg.name][2].add(r)
                continue
            streamed = grid_index in idx_set
            nbytes = (block_bytes(idx_set, arg.dtype.itemsize)
                      * (2 if streamed else 1))
            arg_info[arg.name] = (nbytes, streamed, {r})
    resident_total = sum(nb for nb, st, _ in arg_info.values() if not st)
    row_stream = [0] * einsum.b
    for nb, st, rows in arg_info.values():
        if st:
            for r in (rows if split_rows else list(rows)[:1]):
                row_stream[r] += nb
    out_per_row = block_bytes(einsum.out_idx_set, 4) * 2
    if schedule is not None and schedule.nsteps > 1:
        inter_per_row = schedule_intermediates_vmem_bytes(
            einsum, schedule, block_long, grid_index,
            index_to_length=lengths) // einsum.b
    else:
        # intermediates: assume one extra output-sized f32 working set/row
        inter_per_row = out_per_row
    if split_rows:
        return (resident_total + max(row_stream)
                + out_per_row + inter_per_row)
    return (resident_total + sum(row_stream)
            + einsum.b * (out_per_row + inter_per_row))


def _try_build_flat_elementwise(program, lengths):
    """Pure-elementwise programs over operands that are ALREADY 1D stream as
    dense flat blocks.  Multi-dim operands are rejected: flattening them
    in-graph is a full HBM relayout on XLA:TPU ((E, 35) -> (N,) physically
    retiles; measured 64 GB/s end-to-end on v5e, scripts/tpu_stream_probe.py)
    — use dof-major + fold_long for those (exact (8,128) tiling with no
    relayout, 88-94% of the bus measured)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..codegen.program import output_dtype

    e = program.einsum
    desc = program.descriptor
    if program.schedule.nsteps != 1 or e.sum_indices:
        return None
    out_set = tuple(e.out_idx_set)
    if any(tuple(s) != out_set for s in e.in_idx_sets):
        return None
    if desc.arg_layouts or desc.out_layout:
        return None
    if len(out_set) != 1:
        return None    # multi-dim operands: flattening = hidden HBM relayout

    n_total = 1
    for ix in out_set:
        n_total *= lengths[ix]
    inner = n_total // lengths[out_set[0]] if out_set else 1
    blk = max(1024, (desc.block_long * max(inner, 1) // 1024) * 1024)
    blk = min(blk, n_total)
    grid = (pl.cdiv(n_total, blk),)

    arg_names = sorted(e.all_args)
    out_dtypes = [output_dtype(e, r) for r in range(e.b)]
    n_rows = e.b

    def kernel(*refs):
        in_refs = dict(zip(arg_names, refs[:len(arg_names)]))
        out_refs = refs[len(arg_names):]
        for row in range(n_rows):
            acc = None
            for arg in e.args[row]:
                v = in_refs[arg.name][...]
                acc = v if acc is None else acc * v
            out_refs[row][...] = acc.astype(out_dtypes[row])

    interpret = desc.interpret
    if interpret is None:
        interpret = not _on_tpu()
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(desc.dimension_semantics,),
            vmem_limit_bytes=int(desc.vmem_limit_bytes or 100 * 1024 * 1024))

    from .layouts import index_map_i32
    spec = pl.BlockSpec((blk,), index_map_i32(lambda g: (g,)))
    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[spec] * len(arg_names),
        out_specs=tuple(spec for _ in range(n_rows)) if n_rows > 1 else spec,
        out_shape=(tuple(jax.ShapeDtypeStruct((n_total,), dt)
                         for dt in out_dtypes) if n_rows > 1
                   else jax.ShapeDtypeStruct((n_total,), out_dtypes[0])),
        interpret=interpret, **kw)

    out_shape = tuple(lengths[ix] for ix in out_set)

    def fn(arrays_by_name: dict):
        flats = [jnp.reshape(arrays_by_name[name], (n_total,))
                 for name in arg_names]
        outs = call(*flats)
        if n_rows == 1:
            outs = (outs,)
        return tuple(jnp.reshape(o, out_shape) for o in outs)

    return jax.jit(fn)


def _build_multigrid(program, lengths: dict):
    """Pallas path for CONCRETE einsums gridded over a tuple of output axes
    (``descriptor.grid_index = ("a", "d")``): each grid cell computes one
    slice of the output and writes it directly in the stored layout.

    This is the first-party tensor-contraction kernel (the COGENT-space
    analog, reference tuning/impls/cogent.py:52-115): XLA handles
    MXU-tiling of big GEMM-able TCs well, but expansion-heavy cases (rank-6
    outputs, tiny contracted axes — e.g. TCCG #35 'dfgb,geac->abcdef')
    measured ~5% of the bandwidth roofline because XLA materializes the
    output through transposes; writing each tile once, in place, from VMEM
    dots/broadcasts removes that entirely."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..codegen.program import output_dtype
    from ..contraction_schedule import EinsumOperand, IntermediateResult
    from .kernel_lowering import lower_step, rep_from_block

    e = program.einsum
    desc = program.descriptor
    grid_letters = tuple(desc.grid_index)
    for l in grid_letters:
        if l not in e.out_idx_set:
            raise InvalidParameterError(
                f"multi-axis grid letter {l!r} must be an output axis")
        if isinstance(e.index_to_dim_length[l], SizeParam):
            raise InvalidParameterError(
                "multi-axis grids require concrete axes")
    if desc.fold_long > 1 or desc.preblock_args or desc.flatten:
        raise InvalidParameterError(
            "multi-axis grids do not compose with fold/preblock/flatten")

    arg_idx = _arg_index_sets(e)
    layouts = desc.arg_layouts_map
    stored_idx = {}
    for name, idx_set in arg_idx.items():
        perm = layouts.get(name)
        stored_idx[name] = (tuple(idx_set[p] for p in perm)
                            if perm is not None else tuple(idx_set))

    blocks = {l: int(b) for l, b in desc.grid_blocks}
    for l, b in blocks.items():
        if l not in grid_letters:
            raise InvalidParameterError(
                f"grid_blocks letter {l!r} is not a grid letter")
        if b < 1 or int(lengths[l]) % b:
            raise InvalidParameterError(
                f"grid block {b} does not divide {l}={lengths[l]}")

    grid = tuple(int(lengths[l]) // blocks.get(l, 1) for l in grid_letters)
    gpos = {l: i for i, l in enumerate(grid_letters)}

    def spec_of(idx_tuple):
        blk = tuple(blocks.get(l, 1) if l in gpos else int(lengths[l])
                    for l in idx_tuple)

        def imap(*gids, idx_tuple=idx_tuple):
            return tuple(gids[gpos[l]] if l in gpos else 0
                         for l in idx_tuple)
        from .layouts import index_map_i32
        return pl.BlockSpec(blk, index_map_i32(imap))

    arg_names = sorted(e.all_args)
    in_specs = [spec_of(stored_idx[name]) for name in arg_names]

    out_dtypes = [output_dtype(e, r) for r in range(e.b)]
    if desc.out_layout is not None:
        out_idx = tuple(e.out_idx_set[p] for p in desc.out_layout)
    else:
        out_idx = tuple(e.out_idx_set)
    out_specs = [spec_of(out_idx) for _ in range(e.b)]
    out_shapes = [jax.ShapeDtypeStruct(
        tuple(int(lengths[l]) for l in out_idx), dt) for dt in out_dtypes]

    lengths_kernel = dict(lengths)
    for l in grid_letters:
        lengths_kernel[l] = blocks.get(l, 1)

    # the in-kernel MXU row (M) letter: an output axis with in-cell extent
    # > 1 handed to the lowering as its "e" row axis, so contractions lower
    # to (m,k)@(k,n) dots instead of VPU broadcast-sums (None = v0 replay)
    m_letter = desc.grid_m
    if m_letter is not None:
        if m_letter not in e.out_idx_set:
            raise InvalidParameterError(
                f"grid_m {m_letter!r} must be an output axis")
        if int(lengths_kernel[m_letter]) <= 1:
            raise InvalidParameterError(
                f"grid_m {m_letter!r} has in-cell extent"
                f" {lengths_kernel[m_letter]}; block it or leave it"
                " ungridded")

    accum = jnp.dtype(desc.accum_dtype) if desc.accum_dtype else None
    compute_dtype = (jnp.dtype(desc.compute_dtype)
                     if desc.compute_dtype else None)
    prec_name = (desc.precision or "default").lower()
    eff_dtype = compute_dtype or max(
        (dt for dt in e.arg_to_dtype.values()), key=lambda d: d.itemsize)
    if prec_name == "default":
        dot_precision = (jax.lax.Precision.HIGHEST
                         if np.dtype(eff_dtype).itemsize >= 4 else None)
    elif prec_name == "fastest":
        dot_precision = None
    elif prec_name == "bf16_3x":
        dot_precision = "bf16_3x"
    else:
        dot_precision = getattr(jax.lax.Precision, prec_name.upper())

    schedule = program.schedule
    n_rows = e.b

    def kernel(*refs):
        in_refs = dict(zip(arg_names, refs[:len(arg_names)]))
        out_refs = refs[len(arg_names):]
        rep_cache: dict = {}
        step_cache: dict = {}
        for row in range(n_rows):
            env: dict = {}
            env_key: dict = {}
            result = None
            for subs, name, step_args in zip(schedule.subscripts,
                                             schedule.result_names,
                                             schedule.arguments):
                ins_sub, out_sub = subs.replace(" ", "").split("->")
                factors, factor_keys = [], []
                for a, s in zip(step_args, ins_sub.split(",")):
                    if isinstance(a, EinsumOperand):
                        arg = e.args[row][a.position]
                        use_letters = e.in_idx_sets[a.position]
                        key = (arg.name, stored_idx[arg.name])
                        if key not in rep_cache:
                            blk = in_refs[arg.name][...]
                            if compute_dtype is not None:
                                blk = blk.astype(compute_dtype)
                            rep_cache[key] = rep_from_block(
                                blk, stored_idx[arg.name], m_letter,
                                lengths_kernel)
                        rep = rep_cache[key]
                        trans = dict(zip(use_letters, s))
                        if any(trans[l] != l for l in use_letters):
                            rep = rep.rename(trans)
                        factors.append(rep)
                        factor_keys.append(("arg", arg.name, s))
                    else:
                        assert isinstance(a, IntermediateResult)
                        factors.append(env[a.name])
                        factor_keys.append(env_key[a.name])
                skey = (subs, tuple(factor_keys))
                if skey not in step_cache:
                    step_cache[skey] = lower_step(
                        factors, tuple(out_sub), m_letter, lengths_kernel,
                        accum_dtype=accum, big_order_pref=out_idx,
                        dot_precision=dot_precision, mstack=desc.mstack)
                env[name] = step_cache[skey]
                env_key[name] = skey
                result = env[name]
            # store: small-axis combos index the block; big axes are slices
            for key, val in result.data.items():
                combo = dict(zip(result.small, key))
                idx = []
                for l in out_idx:
                    if l in result.small:
                        idx.append(combo[l])
                    else:
                        idx.append(slice(None))
                out_big = tuple(l for l in out_idx if l not in result.small)
                if len(result.big) == 2 and tuple(result.big) != out_big:
                    val = val.swapaxes(0, 1)
                out_refs[row][tuple(idx)] = val.astype(out_dtypes[row])

    interpret = desc.interpret
    if interpret is None:
        interpret = not _on_tpu()
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(desc.dimension_semantics,) * len(grid),
            vmem_limit_bytes=int(desc.vmem_limit_bytes or 100 * 1024 * 1024))

    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if n_rows > 1 else out_specs[0],
        out_shape=tuple(out_shapes) if n_rows > 1 else out_shapes[0],
        interpret=interpret, **kw)

    def fn(arrays_by_name: dict):
        outs = call(*[arrays_by_name[name] for name in arg_names])
        return outs if n_rows > 1 else (outs,)

    return jax.jit(fn)


def build_pallas_executable(program, index_to_length: dict):
    """Compile *program* with the Pallas backend; returns
    ``fn(arrays_by_name) -> tuple`` like the XLA backend."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..codegen.program import output_dtype
    from ..contraction_schedule import EinsumOperand, IntermediateResult

    e = program.einsum
    desc = program.descriptor
    lengths = dict(index_to_length)

    if getattr(desc, "dd_pairs", False):
        from .dd_emitter import build_dd_executable
        return build_dd_executable(program, lengths)

    if isinstance(desc.grid_index, tuple):
        return _build_multigrid(program, lengths)

    if not desc.multiple_results_in_one_kernel and e.b > 1:
        # one pallas_call per batch row: rows lose operand-DMA sharing and
        # cross-row CSE but each kernel is smaller (less VMEM, simpler
        # Mosaic scheduling) — a tuner-scorable alternative (the knob the
        # round-1 spaces declared but never interpreted, VERDICT r1 #7)
        subfns = []
        for row in range(e.b):
            sub_e = e.copy(args=(e.args[row],))
            row_names = sub_e.all_args
            sub_desc = desc.copy(
                multiple_results_in_one_kernel=True,
                arg_layouts=tuple((n, p) for n, p in desc.arg_layouts
                                  if n in row_names),
                preblock_args=tuple(n for n in desc.preblock_args
                                    if n in row_names))
            subfns.append(build_pallas_executable(
                program.copy(einsum=sub_e, descriptor=sub_desc),
                index_to_length))

        def split_fn(arrays_by_name: dict):
            outs = []
            for sf in subfns:
                outs.extend(sf(arrays_by_name))
            return tuple(outs)

        return jax.jit(split_fn)

    if desc.flatten:
        if getattr(desc, "fold_long", 1) > 1:
            raise InvalidParameterError(
                "flatten and fold_long are mutually exclusive")
        if getattr(desc, "preblock_args", ()):
            raise InvalidParameterError(
                "flatten and preblock_args are mutually exclusive")
        flat = _try_build_flat_elementwise(program, lengths)
        if flat is not None:
            return flat
        raise InvalidParameterError(
            "flatten=True requires a single-step, contraction-free program"
            " whose operands all share the output subscript")

    grid_ix = _pick_grid_index(program, lengths)
    arg_idx = _arg_index_sets(e)
    layouts = desc.arg_layouts_map

    # pre-blocked tile-exact storage for small streamed args (see
    # descriptor.preblock_args / layouts.preblock_arrays)
    from .layouts import (check_preblockable, preblock_engaged,
                          preblock_geometry, preblock_names)
    pb_names = set(preblock_names(program))
    if pb_names:
        check_preblockable(program)

    # fold-8 sublane layout: the long axis is stored (f, E/f) so short-dof
    # dof-major arrays tile HBM exactly (no 35->40 sublane padding; measured
    # 600 -> 691 GB/s streaming on v5e, scripts/tpu_fold_probe*.py).  Blocks
    # arrive (..., f, blkC) and are merged in-kernel to (..., f*blkC) — a
    # free view, since sublane tiles group rows in 8s — so the lowering
    # below is unchanged apart from the block boundaries.
    fold = getattr(desc, "fold_long", 1) or 1
    if fold > 1:
        from .layouts import check_foldable
        fold_ix = check_foldable(program)
        if grid_ix is None or fold_ix != grid_ix:
            raise InvalidParameterError(
                f"fold_long targets axis {fold_ix!r} but the grid is over"
                f" {grid_ix!r}")
        if lengths[grid_ix] % fold:
            raise InvalidParameterError(
                f"fold_long={fold} requires the long axis"
                f" ({lengths[grid_ix]}) to be divisible by it")

    # stored (HBM) subscript per arg after layout permutation
    stored_idx = {}
    for name, idx_set in arg_idx.items():
        perm = layouts.get(name)
        stored_idx[name] = (tuple(idx_set[p] for p in perm) if perm is not None
                            else tuple(idx_set))

    if pb_names and grid_ix is not None and not preblock_engaged(
            desc.block_long, lengths[grid_ix], fold):
        pb_names = set()    # tiny axis: plain storage (see preblock_engaged)

    if grid_ix is None:
        grid = (1,)
        block_long = None
        blk_c = None
        c_len = None
    elif fold > 1:
        c_len = lengths[grid_ix] // fold
        blk_c = min(max(desc.block_long // fold, 1), c_len)
        if blk_c != c_len and blk_c % 128:
            # Mosaic requires the trailing block dim divisible by the lane
            # count (128) unless it spans the whole array
            raise InvalidParameterError(
                f"fold_long={fold} with block_long={desc.block_long} gives a"
                f" {blk_c}-lane c-block; must be a multiple of 128 (or cover"
                f" the whole {c_len}-long axis)")
        block_long = blk_c * fold        # merged in-kernel length
        grid = (pl.cdiv(c_len, blk_c),)
    elif pb_names:
        # pre-blocked args need block_long % 8 == 0 and a grid that matches
        # their nb leading dim exactly.  When the rounded-up block exceeds
        # the axis (single-block case, L % 8 != 0), normal args keep their
        # exact length (Mosaic requires trailing block dims divisible by
        # 128 OR equal to the array dim) and the pre-blocked merged block
        # is cropped in-kernel.
        L = lengths[grid_ix]
        pb_block_long, _pb_blk_c, _pb_nb = preblock_geometry(
            desc.block_long, L, 1)
        block_long = min(pb_block_long, L)
        blk_c = None
        c_len = None
        grid = (_pb_nb,)
    else:
        L = lengths[grid_ix]
        block_long = min(desc.block_long, L)
        blk_c = None
        c_len = None
        grid = (pl.cdiv(L, block_long),)

    long_is_contracted = (grid_ix is not None
                          and grid_ix not in e.out_idx_set)
    if long_is_contracted and grid[0] > 1 and desc.dimension_semantics \
            == "parallel":
        raise InvalidParameterError(
            "cannot use 'parallel' grid semantics when the grid axis is"
            " contracted (the kernel accumulates across grid steps)")

    def block_shape_of(idx_tuple):
        shape = []
        for ix in idx_tuple:
            if ix == grid_ix:
                shape.extend((fold, blk_c) if fold > 1 else (block_long,))
            else:
                shape.append(lengths[ix])
        return tuple(shape)

    def full_shape_of(idx_tuple):
        shape = []
        for ix in idx_tuple:
            if ix == grid_ix and fold > 1:
                shape.extend((fold, c_len))
            else:
                shape.append(lengths[ix])
        return tuple(shape)

    from .layouts import index_map_i32

    def index_map_of(idx_tuple):
        def imap(g):
            out = []
            for ix in idx_tuple:
                if ix == grid_ix:
                    out.extend((0, g) if fold > 1 else (g,))
                else:
                    out.append(0)
            return tuple(out)
        return index_map_i32(imap)

    pb_f = fold if fold > 1 else 8
    if fold > 1:
        pb_blk_c = blk_c
    elif pb_names and grid_ix is not None:
        pb_blk_c = pb_block_long // 8
    else:
        pb_blk_c = None

    def in_spec_of(name):
        if name not in pb_names:
            return pl.BlockSpec(block_shape_of(stored_idx[name]),
                                index_map_of(stored_idx[name]))
        lead = stored_idx[name][:-1]
        blk = (1,) + tuple(lengths[ix] for ix in lead) + (pb_f, pb_blk_c)
        nzeros = len(blk) - 1

        def imap(g, nzeros=nzeros):
            return (g,) + (0,) * nzeros
        return pl.BlockSpec(blk, index_map_i32(imap))

    arg_names = sorted(e.all_args)
    in_specs = [in_spec_of(name) for name in arg_names]

    out_dtypes = [output_dtype(e, r) for r in range(e.b)]
    # outputs may be stored in a permuted layout (e.g. dof-major (35, E) so
    # the long axis rides the dense lane dimension — the TTGT-analog layout
    # choice); callers receive the stored layout
    if desc.out_layout is not None:
        out_idx = tuple(e.out_idx_set[p] for p in desc.out_layout)
    else:
        out_idx = tuple(e.out_idx_set)
    out_block = block_shape_of(out_idx)
    out_shapes = [
        jax.ShapeDtypeStruct(full_shape_of(out_idx), dt)
        for dt in out_dtypes]
    out_specs = [pl.BlockSpec(out_block, index_map_of(out_idx))
                 for _ in range(e.b)]

    n_rows = e.b
    schedule = program.schedule
    accum = jnp.dtype(desc.accum_dtype) if desc.accum_dtype else None
    compute_dtype = (jnp.dtype(desc.compute_dtype)
                     if desc.compute_dtype else None)

    # {{{ hoist resident-only steps out of the kernel (descriptor knob
    # hoist_resident_steps): a step none of whose inputs carries the grid
    # axis (transitively) is evaluated ONCE per launch in XLA and fed to
    # the kernel as a raw block.  In-kernel it would recompute per grid
    # step, and a Mosaic dot contracting a COMPUTED resident operand runs
    # ~5x slower than from a raw block (the curl-prereduce trap, CLAUDE.md).

    _steps = list(zip(schedule.subscripts, schedule.result_names,
                      schedule.arguments))
    host_step_set: set = set()
    if desc.hoist_resident_steps and grid_ix is not None:
        _carries: dict = {}
        for subs, name, step_args in _steps:
            carried = False
            for a in step_args:
                if isinstance(a, EinsumOperand):
                    if grid_ix in e.in_idx_sets[a.position]:
                        carried = True
                elif _carries[a.name]:
                    carried = True
            _carries[name] = carried
            if not carried:
                host_step_set.add(name)
        host_step_set.discard(schedule.result_names[-1])
    kernel_steps = [s for s in _steps if s[1] not in host_step_set]
    host_steps = [s for s in _steps if s[1] in host_step_set]

    # per-row plan: which pallas input slot serves each host result (rows
    # whose host steps read identical operands share a slot — the cross-row
    # CSE that row_result applies to in-kernel steps)
    host_slot_of = [dict() for _ in range(n_rows)]   # row -> name -> skey
    host_slots: dict = {}                            # skey -> (letters, slot)
    for row in range(n_rows):
        _env_key: dict = {}
        for subs, name, step_args in host_steps:
            out_sub = subs.replace(" ", "").split("->")[1]
            fkeys = []
            for a in step_args:
                if isinstance(a, EinsumOperand):
                    fkeys.append(("arg", e.args[row][a.position].name))
                else:
                    fkeys.append(_env_key[a.name])
            skey = (subs, tuple(fkeys))
            _env_key[name] = skey
            host_slot_of[row][name] = skey
            if skey not in host_slots:
                host_slots[skey] = (tuple(out_sub),
                                    f"_host{len(host_slots)}")
    host_input_names = [slot for _, slot in host_slots.values()]
    for letters, slot in host_slots.values():
        stored_idx[slot] = letters
    host_specs = [
        pl.BlockSpec(tuple(lengths[ix] for ix in letters),
                     index_map_i32(lambda g, nz=len(letters): (0,) * nz))
        for letters, _slot in host_slots.values()]

    def compute_host_arrays(arrays_by_name) -> list:
        """Evaluate the hoisted steps in XLA (f32/f64 inputs at HIGHEST
        precision, matching the in-kernel dot policy so the numpy-oracle
        tolerances are unchanged)."""
        vals: dict = {}
        for row in range(n_rows):
            env: dict = {}      # name -> (letters, value)
            for subs, name, step_args in host_steps:
                ins_sub, out_sub = subs.replace(" ", "").split("->")
                ops = []
                for a, s_ in zip(step_args, ins_sub.split(",")):
                    if isinstance(a, EinsumOperand):
                        arg = e.args[row][a.position]
                        arr = arrays_by_name[arg.name]
                        perm = layouts.get(arg.name)
                        if perm is not None:
                            arr = jnp.transpose(arr,
                                                tuple(np.argsort(perm)))
                        ops.append(arr)
                    else:
                        letters, val = env[a.name]
                        if tuple(s_) != letters:
                            val = jnp.transpose(
                                val, [letters.index(c) for c in s_])
                        ops.append(val)
                skey = host_slot_of[row][name]
                slot = host_slots[skey][1]
                if slot in vals:
                    env[name] = (host_slots[skey][0], vals[slot])
                    continue
                hp = (jax.lax.Precision.HIGHEST if all(
                    jnp.dtype(o.dtype).itemsize >= 4 for o in ops) else None)
                val = jnp.einsum(f"{ins_sub}->{out_sub}", *ops,
                                 precision=hp)
                env[name] = (host_slots[skey][0], val)
                vals[slot] = val
        return [vals[slot] for slot in host_input_names]

    # }}}

    # MXU precision for in-kernel dots: f32/f64 default to HIGHEST (bf16_6x
    # passes) so results meet the numpy-oracle tolerance; bf16/low-precision
    # compute dtypes keep the fast single-pass path.  descriptor.precision
    # overrides ("fastest" = single-pass bf16 multiplies on f32 data).
    prec_name = (desc.precision or "default").lower()
    eff_dtype = compute_dtype or max(
        (dt for dt in e.arg_to_dtype.values()), key=lambda d: d.itemsize)
    if prec_name == "default":
        dot_precision = (jax.lax.Precision.HIGHEST
                         if np.dtype(eff_dtype).itemsize >= 4 else None)
    elif prec_name == "fastest":
        dot_precision = None
    elif prec_name == "bf16_3x":
        # manual 3-pass split-bf16 f32 matmul (see kernel_lowering)
        dot_precision = "bf16_3x"
    else:
        dot_precision = getattr(jax.lax.Precision, prec_name.upper())

    from .kernel_lowering import Rep, lower_step, rep_from_block

    # in-kernel axis lengths: the grid axis shrinks to one block (one
    # sublane plane of it when folded — the lowering runs per s-slice)
    lengths_kernel = dict(lengths)
    if grid_ix is not None:
        lengths_kernel[grid_ix] = blk_c if fold > 1 else block_long

    def row_result(row, rep_cache, step_cache, blocks_by_name) -> "Rep":
        env = {}
        env_key = {}
        result = None

        def host_rep(name):
            """Rep of a hoisted-step result (raw resident block)."""
            letters, slot = host_slots[host_slot_of[row][name]]
            hkey = ("host", slot)
            if hkey not in rep_cache:
                blk = blocks_by_name[slot]
                if compute_dtype is not None:
                    blk = blk.astype(compute_dtype)
                rep_cache[hkey] = rep_from_block(
                    blk, letters, grid_ix, lengths_kernel)
            return rep_cache[hkey], hkey

        for subs, name, step_args in kernel_steps:
            ins_sub, out_sub = subs.replace(" ", "").split("->")
            ins_subs = ins_sub.split(",")
            factors = []
            factor_keys = []
            for a, s in zip(step_args, ins_subs):
                if isinstance(a, EinsumOperand):
                    arg = e.args[row][a.position]
                    use_letters = e.in_idx_sets[a.position]
                    # physical block axes = stored permutation of this use's
                    # letters
                    perm = layouts.get(arg.name)
                    stored_use = (tuple(use_letters[p] for p in perm)
                                  if perm is not None else tuple(use_letters))
                    key = (arg.name, stored_use)
                    if key not in rep_cache:
                        blk = blocks_by_name[arg.name]
                        if compute_dtype is not None:
                            blk = blk.astype(compute_dtype)
                        rep_cache[key] = rep_from_block(
                            blk, stored_use, grid_ix, lengths_kernel)
                    rep = rep_cache[key]
                    # step letters may differ from einsum letters
                    trans = dict(zip(use_letters, s))
                    if any(trans[l] != l for l in use_letters):
                        rep = rep.rename(trans)
                    factors.append(rep)
                    factor_keys.append(("arg", arg.name, stored_use, s))
                else:
                    assert isinstance(a, IntermediateResult)
                    if a.name not in env and a.name in host_slot_of[row]:
                        env[a.name], env_key[a.name] = host_rep(a.name)
                    factors.append(env[a.name])
                    factor_keys.append(env_key[a.name])
            # cross-row CSE (the hoist_cses analog, reference cse.py:307):
            # identical steps over identical operands compute once per block
            skey = (subs, tuple(factor_keys))
            if skey not in step_cache:
                step_cache[skey] = lower_step(
                    factors, tuple(out_sub), grid_ix, lengths_kernel,
                    accum_dtype=accum, big_order_pref=out_idx,
                    dot_precision=dot_precision, mfold=desc.mfold)
            env[name] = step_cache[skey]
            env_key[name] = skey
            result = env[name]
        return result

    # when the long axis is contracted and the last block is padded, the pad
    # garbage would enter the accumulated sum: zero-mask every block that
    # carries the grid axis (0 * garbage = 0 keeps all step products exact).
    # With fold, padding can only occur on the trailing c axis (E % fold is
    # enforced == 0), so the mask tests c positions.
    if fold > 1:
        needs_tail_mask = (long_is_contracted and grid_ix is not None
                           and c_len % blk_c != 0)
    else:
        needs_tail_mask = (long_is_contracted and grid_ix is not None
                           and lengths[grid_ix] % (block_long or 1) != 0)

    def _mask_tail(name, blk):
        if not needs_tail_mask or grid_ix not in stored_idx[name]:
            return blk
        if fold > 1:
            axis = blk.ndim - 1             # the c axis (grid stored last)
            pos = (jax.lax.broadcasted_iota(jnp.int32, blk.shape, axis)
                   + pl.program_id(0) * blk_c)
            return jnp.where(pos < c_len, blk, jnp.zeros_like(blk))
        axis = stored_idx[name].index(grid_ix)
        pos = (jax.lax.broadcasted_iota(jnp.int32, blk.shape, axis)
               + pl.program_id(0) * block_long)
        return jnp.where(pos < lengths[grid_ix], blk,
                         jnp.zeros_like(blk))

    # folded pure products (copies, Hadamard): every operand/output shares
    # the stored subscript, so the product runs directly on the 3/4D folded
    # blocks — no slicing, native exact-tile streaming (691 GB/s measured,
    # scripts/tpu_fold_probe.py case B)
    fold_elementwise = (
        fold > 1 and schedule.nsteps == 1 and not e.sum_indices
        and all(stored_idx[name] == tuple(out_idx)
                for name in arg_names))

    def _store(row, out_refs, idx, val):
        if long_is_contracted and grid[0] > 1:
            @pl.when(pl.program_id(0) == 0)
            def _init(row=row, idx=idx, val=val):
                out_refs[row][idx] = val

            @pl.when(pl.program_id(0) > 0)
            def _acc(row=row, idx=idx, val=val):
                out_refs[row][idx] = out_refs[row][idx] + val
        else:
            out_refs[row][idx] = val

    def _store_rep(row, out_refs, res, s_slot):
        # store every unrolled slice of the result Rep; with fold, the grid
        # letter occupies two block dims (f, blkC) and s_slot picks the
        # sublane plane
        for key, val in res.data.items():
            combo = dict(zip(res.small, key))
            idx = []
            for l in out_idx:
                if l == grid_ix and fold > 1:
                    idx.extend((s_slot, slice(None)))
                elif l in res.small:
                    idx.append(combo[l])
                else:
                    idx.append(slice(None))
            # value dims follow res.big; match the output's big-axis order
            out_big = tuple(l for l in out_idx if l not in res.small)
            if len(res.big) == 2 and tuple(res.big) != out_big:
                val = val.swapaxes(0, 1)
            _store(row, out_refs, tuple(idx), val.astype(out_dtypes[row]))

    def _load_block(name, ref):
        if name not in pb_names:
            return _mask_tail(name, ref[...])
        # pre-blocked: (1, *lead, pb_f, blk_c); host zero-padded the tail,
        # so no mask is needed.  Unfolded kernels see the merged element
        # axis (a small sublane->lane relayout, arg is tiny by design);
        # folded kernels consume the per-plane layout directly.
        raw = ref[...]
        if fold > 1:
            return raw[0]
        lead_shape = raw.shape[1:-2]
        merged = raw.reshape(lead_shape + (pb_block_long,))
        if pb_block_long > block_long:
            merged = merged[..., :block_long]
        return merged

    all_input_names = list(arg_names) + host_input_names

    def kernel(*refs):
        in_refs = refs[:len(all_input_names)]
        out_refs = refs[len(all_input_names):]
        blocks = {name: _load_block(name, ref)
                  for name, ref in zip(all_input_names, in_refs)}

        if fold_elementwise:
            for row in range(n_rows):
                acc = None
                for arg in e.args[row]:
                    v = blocks[arg.name]
                    if compute_dtype is not None:
                        v = v.astype(compute_dtype)
                    acc = v if acc is None else acc * v
                out_refs[row][...] = acc.astype(out_dtypes[row])
            return

        if fold > 1:
            # per-sublane-plane lowering: each s-slice looks exactly like an
            # unfolded 2D block of blkC long-elements, so the Rep machinery
            # runs unchanged (MXU dots keep K on sublanes, no relayouts of
            # full blocks — only the slice extraction itself)
            slices = {
                s: {name: (blk[..., s, :]
                           if grid_ix in stored_idx[name] else blk)
                    for name, blk in blocks.items()}
                for s in range(fold)}
            caches = {s: ({}, {}) for s in range(fold)}
            for row in range(n_rows):
                if grid_ix in out_idx:
                    for s in range(fold):
                        rep_cache, step_cache = caches[s]
                        res = row_result(row, rep_cache, step_cache,
                                         slices[s])
                        _store_rep(row, out_refs, res, s)
                else:
                    # grid axis contracted: sum the per-plane results
                    total = None
                    for s in range(fold):
                        rep_cache, step_cache = caches[s]
                        res = row_result(row, rep_cache, step_cache,
                                         slices[s])
                        if total is None:
                            total = res
                        else:
                            total = Rep(total.small, total.big,
                                        {k: total.data[k] + res.data[k]
                                         for k in total.data})
                    _store_rep(row, out_refs, total, None)
            return

        rep_cache: dict = {}
        step_cache: dict = {}
        for row in range(n_rows):
            res = row_result(row, rep_cache, step_cache, blocks)
            _store_rep(row, out_refs, res, None)

    interpret = desc.interpret
    if interpret is None:
        interpret = not _on_tpu()

    compiler_params = None
    if not interpret:
        dim_sem = ("arbitrary" if long_is_contracted
                   else desc.dimension_semantics,)
        kw = {"dimension_semantics": dim_sem,
              # Mosaic's default scoped-vmem cap (~16M) is far below the
              # chip's VMEM; give kernels room unless the schedule says less
              "vmem_limit_bytes": int(desc.vmem_limit_bytes
                                      or 100 * 1024 * 1024)}
        compiler_params = pltpu.CompilerParams(**kw)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + host_specs,
        out_specs=tuple(out_specs) if n_rows > 1 else out_specs[0],
        out_shape=tuple(out_shapes) if n_rows > 1 else out_shapes[0],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )

    def fn(arrays_by_name: dict):
        host_arrays = (compute_host_arrays(arrays_by_name)
                       if host_steps else [])
        outs = call(*[arrays_by_name[name] for name in arg_names],
                    *host_arrays)
        return outs if n_rows > 1 else (outs,)

    return jax.jit(fn)
