"""
Analytic per-launch cost model for schedule descriptors — the tuner's
proposal ranker.

The reference leans on OpenTuner's model-free search; on this TPU every
measurement costs a 20-600 s remote compile, so sample efficiency IS the
tuning budget.  This model predicts a launch time from facts measured on
the actual hardware (CLAUDE.md / scripts/tpu_*probe.py):

  * **HBM traffic with tiled-layout amplification**: XLA:TPU stores arrays
    in T(8,128) tiles — the last dim pads to a 128 multiple, the
    second-to-last to an 8 multiple ((E,35) f32 streams 3.66x its logical
    bytes; dof-major (35,E) only 40/35; 1D arrays tile densely).  Stored
    shapes come from the SAME code that packs real inputs
    (:func:`~feinsum_tpu.apply_layouts` under ``jax.eval_shape``), so every
    rewrite's contract (fold/preblock/lane_pack/rowcat/pre_layouts) is
    priced exactly as shipped.
  * **streaming efficiency**: measured ceilings — pure-elementwise kernels
    reach ~90% of the 819 GB/s bus, dot-in-the-loop kernels ~79%; the
    write-drain ceiling is separate (652 GB/s).
  * **MXU work with tile padding**: per schedule step, dot flops with the
    contraction/lane axes padded to the 128x128 MXU tile (a K=N=35 dot
    wastes ~(35/128)^2 of each pass) at the precision's measured rate
    (HIGHEST = 6-pass bf16 ~ half the 3-pass f32 ceiling).
  * **per-grid-step overhead**: the small-ndof P1/P2 tax; a fixed ~1.5 us
    per step (DMA descriptor + Mosaic prologue) — the term that makes
    rowcat (1/b steps) and lane_pack (1/g steps) win where they should.

The prediction is a RANKER, not a clock: measurements stay ground truth;
:func:`~feinsum_tpu.tuning.autotune` uses it to pick which random
candidates to spend real compiles on.  ``scripts/cost_model_report.py``
rank-correlates it against every archived measurement.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..data.device_info import (
    DEV_TO_PEAK_BW,
    DEV_TO_PEAK_GFLOPS,
    DEV_TO_PEAK_WRITE_BW,
)
from ..einsum import SizeParam

# measured on v5e (CLAUDE.md): fold elementwise 88-94% of bus, MXU-in-loop
# 77-81%
_EFF_STREAM = 0.90
_EFF_WITH_DOTS = 0.79
# fixed per-grid-step cost (DMA descriptors + kernel prologue), seconds
_STEP_OVERHEAD_S = 1.5e-6
# 6-pass HIGHEST runs at ~half the 3-pass split-bf16 f32 ceiling (measured
# 31.3 vs 62.6 TF on v5e)
_HIGHEST_DERATE = 0.5


def _tile_padded(shape) -> int:
    """Physical element count of a T(8,128)-tiled array (1D tiles densely;
    the trailing dim pads to 128 lanes, the second-to-last to 8 sublanes)."""
    if len(shape) == 0:
        return 1
    if len(shape) == 1:
        return int(shape[0])
    lanes = math.ceil(shape[-1] / 128) * 128
    subl = math.ceil(shape[-2] / 8) * 8
    n = lanes * subl
    for d in shape[:-2]:
        n *= int(d)
    return n


def _stored_shapes(program, logical_einsum, logical_lengths: dict) -> dict:
    """name -> stored (HBM) shape+dtype of every executable input, via the
    real packing code under eval_shape (no data, no compile).  Inputs are
    the CALLER's, i.e. the pre-rewrite logical einsum's (apply_layouts
    packs them per the descriptor's contract; in-graph kron/expand
    residents never hit HBM as inputs and cost ~nothing at bench sizes)."""
    import jax

    from ..measure import apply_layouts

    e = logical_einsum
    dummies = {}
    for row in e.args:
        for arg, idx in zip(row, e.in_idx_sets):
            shape = tuple(int(logical_lengths[ix]) for ix in idx)
            dummies[arg.name] = jax.ShapeDtypeStruct(
                shape, np.dtype(arg.dtype.name))
    return jax.eval_shape(lambda a: apply_layouts(program, a), dummies)


def _output_stored_shape(program, index_to_length: dict) -> tuple:
    """Stored output shape per the descriptor chain (mirrors
    ops/layouts.unpack_output inverted)."""
    desc = program.descriptor
    e = program.einsum
    # NOTE: lane_pack needs no handling here — the REWRITTEN einsum's
    # output letters already carry the packed extents (i -> g*di) and the
    # long length passed in is already E/g; re-packing would double-count
    # (review r4: the model under-priced small-ndof writes ~4x and
    # mis-ranked exactly the new dg-pack candidates)
    shape = [int(index_to_length[ix]) for ix in e.out_idx_set]
    if desc.pre_out_layout is not None:
        flat = [p for grp in desc.pre_out_layout for p in grp]
        permuted = [shape[p] for p in flat]
        shape, k = [], 0
        for grp in desc.pre_out_layout:
            n = 1
            for _ in grp:
                n *= permuted[k]
                k += 1
            shape.append(n)
    if desc.out_layout is not None:
        shape = [shape[p] for p in desc.out_layout]
    fold = getattr(desc, "fold_long", 1) or 1
    if fold > 1:
        shape = shape[:-1] + [fold, shape[-1] // fold]
    return tuple(shape)


def _schedule_flops(program, index_to_length: dict) -> float:
    """Padded MXU flops per batch row: per step, 2x the product of the
    step's index extents with the (heuristic) lane/contraction axes padded
    to the 128-tile.  Elementwise steps (no contracted axis) count 0 —
    they ride the VPU inside the streaming time."""
    e = program.einsum
    lengths = dict(index_to_length)
    total = 0.0
    for subs in program.schedule.subscripts:
        ins, out = subs.replace(" ", "").split("->")
        factors = ins.split(",")
        letters = {c for f_ in factors for c in f_}
        contracted = sorted(letters - set(out))
        if not contracted or len(factors) < 2:
            continue
        # the MXU K axis: the largest contracted extent, padded to 128;
        # the lane (N) axis: the largest non-long output extent, padded
        long_like = {ix for ix in letters
                     if isinstance(e.index_to_dim_length.get(ix), SizeParam)}
        k_ax = max(contracted, key=lambda c: lengths[c])
        n_cands = [c for c in out if c not in long_like]
        n_ax = max(n_cands, key=lambda c: lengths[c]) if n_cands else None
        flops = 2.0
        for c in sorted(letters):
            ext = float(lengths[c])
            if c == k_ax or c == n_ax:
                ext = math.ceil(ext / 128) * 128
            flops *= ext
        total += flops
    return total


def predict_runtime(program, index_to_length: dict, device_key: str, *,
                    logical_einsum=None, logical_lengths=None
                    ) -> Optional[float]:
    """Predicted seconds per launch of *program* at the given lengths, or
    ``None`` when the device has no peak tables.  *index_to_length* covers
    the (possibly rewritten) program einsum's letters; pass the
    pre-rewrite *logical_einsum*/*logical_lengths* when the program was
    rewritten (lane_pack/rowcat) so input traffic prices the caller's
    arrays.  Raises whatever the descriptor's packing code raises for
    structurally invalid programs (callers treat exceptions as "can't
    rank")."""
    bw = DEV_TO_PEAK_BW.get(device_key)
    peaks = DEV_TO_PEAK_GFLOPS.get(device_key)
    if not bw or not peaks:
        return None
    wbw = DEV_TO_PEAK_WRITE_BW.get(device_key, bw)
    e = program.einsum
    desc = program.descriptor

    stored = _stored_shapes(program,
                            logical_einsum if logical_einsum is not None
                            else e,
                            logical_lengths if logical_lengths is not None
                            else index_to_length)
    read_bytes = sum(_tile_padded(v.shape) * np.dtype(v.dtype).itemsize
                     for v in stored.values())
    from ..codegen.program import output_dtype
    rc = getattr(desc, "rowcat", 1) or 1
    n_out = 1 if rc > 1 else e.b
    oshape = _output_stored_shape(program, index_to_length)
    write_bytes = sum(
        _tile_padded(oshape) * np.dtype(output_dtype(e, min(r, e.b - 1))
                                        ).itemsize
        for r in range(n_out))

    flops = _schedule_flops(program, index_to_length) * e.b
    prec = (desc.precision or "default").lower()
    eff_dtype = max((np.dtype(dt.name) for dt in e.arg_to_dtype.values()),
                    key=lambda d: d.itemsize)
    f32_rate = peaks.get("float32", 0.0) * 1e9
    bf16_rate = peaks.get("bfloat16", f32_rate) * 1e9
    if eff_dtype.itemsize < 4:
        rate = bf16_rate
    elif eff_dtype == np.float64:
        rate = peaks.get("float64", f32_rate) * 1e9
    elif prec == "bf16_3x":
        rate = f32_rate
    elif prec == "fastest":
        rate = bf16_rate
    else:                      # default/highest -> 6-pass HIGHEST
        rate = f32_rate * _HIGHEST_DERATE

    # grid-step count: ceil(long extent / block) on the packed long axis
    n_steps = 1.0
    long_letters = [ix for ix, ln in e.index_to_dim_length.items()
                    if isinstance(ln, SizeParam)]
    if desc.backend == "pallas" and long_letters:
        el = long_letters[0]
        L = float(index_to_length[el])
        n_steps = math.ceil(L / max(1, int(desc.block_long)))
    elif isinstance(desc.grid_index, tuple):
        n_steps = 1.0
        for ix in desc.grid_index:
            n_steps *= float(index_to_length[ix])

    eff = _EFF_WITH_DOTS if flops else _EFF_STREAM
    t_read = read_bytes / (eff * bw * 1e9)
    t_write = write_bytes / (eff / _EFF_WITH_DOTS * wbw * 1e9) \
        if flops else write_bytes / (_EFF_STREAM * wbw * 1e9)
    t_mxu = flops / rate if rate else 0.0
    return max(t_read, t_write, t_mxu) + n_steps * _STEP_OVERHEAD_S


def predict_for_params(transform_space, einsum, params: dict,
                       index_to_length: dict, device_key: str
                       ) -> Optional[float]:
    """Bind *params* and predict; ``None`` for invalid/unrankable points
    (the tuner then falls back to measuring them on their random merit)."""
    from ..codegen.program import generate_program

    try:
        transform = transform_space.bind_args(einsum, **params)
        program = transform(generate_program(einsum))
        lengths = dict(index_to_length)
        # rewrites rename/rescale the long axis: rebuild from the REWRITTEN
        # einsum (rowcat multiplies, lane_pack divides — build_executable's
        # rules)
        from ..einsum import SizeParam as _SP
        user_long = [v for k, v in index_to_length.items()
                     if isinstance(einsum.index_to_dim_length.get(k), _SP)]
        g = getattr(program.descriptor, "lane_pack", 1) or 1
        rc = getattr(program.descriptor, "rowcat", 1) or 1
        for ix, ln in program.einsum.index_to_dim_length.items():
            if isinstance(ln, _SP):
                base = user_long[0] if user_long else index_to_length[ix]
                lengths[ix] = int(base) * rc // g
            else:
                lengths[ix] = int(ln)
        return predict_runtime(program, lengths, device_key,
                               logical_einsum=einsum,
                               logical_lengths=index_to_length)
    except Exception:  # noqa: BLE001
        return None
