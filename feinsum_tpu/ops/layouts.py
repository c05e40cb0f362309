"""
Layout inference for streamed operands.

Measured on TPU v5e (scripts/tpu_layout_probe.py): blocks shaped
``(block, ndof)`` with a short trailing axis DMA 4*ndof-byte row fragments at
~23% of HBM peak, while the same data with the long axis on the dense lane
dimension streams at ~70-84%.  ``dofmajor_layouts`` computes the argument and
output permutations that rotate every parametric (long) axis to the back.
"""

from __future__ import annotations

from ..diagnostics import InvalidParameterError
from ..einsum import BatchedEinsum, SizeParam


def dofmajor_layouts(einsum: BatchedEinsum):
    """(arg_layouts, out_layout) rotating long axes to the trailing (lane)
    position for every operand/output that carries one."""
    arg_idx = {}
    for row in einsum.args:
        for arg, idx_set in zip(row, einsum.in_idx_sets):
            arg_idx[arg.name] = idx_set
    long_letters = {ix for ix, ln in einsum.index_to_dim_length.items()
                    if isinstance(ln, SizeParam)}

    def rotate(idx_set):
        perm = [i for i, ix in enumerate(idx_set) if ix not in long_letters]
        perm += [i for i, ix in enumerate(idx_set) if ix in long_letters]
        return tuple(perm)

    layouts = []
    for name, idx_set in arg_idx.items():
        if (set(idx_set) & long_letters) and idx_set \
                and idx_set[-1] not in long_letters:
            layouts.append((name, rotate(idx_set)))
        elif not (set(idx_set) & long_letters) and len(idx_set) > 2:
            # resident (non-streamed) operands: keep the two largest axes
            # trailing so they stay vectorized in VMEM and tiny axes unroll
            # (e.g. the face-lift matrix (i,f,j) -> (f,i,j))
            sizes = {ix: int(einsum.index_to_dim_length[ix])
                     for ix in idx_set}
            biggest = sorted(range(len(idx_set)),
                             key=lambda p: sizes[idx_set[p]])[-2:]
            big_sorted = sorted(biggest)      # keep relative order
            perm = tuple([p for p in range(len(idx_set))
                          if p not in biggest] + big_sorted)
            if perm != tuple(range(len(idx_set))):
                layouts.append((name, perm))
    out = tuple(einsum.out_idx_set)
    out_perm = None
    if out and out[-1] not in long_letters and (set(out) & long_letters):
        out_perm = rotate(out)
    return tuple(layouts), out_perm


# {{{ fold-8 sublane layout (descriptor.fold_long)

def fold_axis_of(program):
    """The long axis letter that ``descriptor.fold_long`` folds, or ``None``
    when folding is off.  Folding targets the grid axis; it must be the
    descriptor's ``grid_index`` or the unique parametric axis."""
    desc = program.descriptor
    f = getattr(desc, "fold_long", 1) or 1
    if f <= 1:
        return None
    if desc.grid_index is not None:
        return desc.grid_index
    params = [ix for ix, ln in program.einsum.index_to_dim_length.items()
              if isinstance(ln, SizeParam)]
    if len(params) != 1:
        raise InvalidParameterError(
            "fold_long requires grid_index or exactly one parametric axis,"
            f" found {params}")
    return params[0]


def stored_arg_layouts(program) -> dict:
    """arg name -> stored (post arg_layouts permutation) index letters."""
    e = program.einsum
    layouts = program.descriptor.arg_layouts_map
    out = {}
    for row in e.args:
        for arg, idx_set in zip(row, e.in_idx_sets):
            perm = layouts.get(arg.name)
            out[arg.name] = (tuple(idx_set[p] for p in perm)
                             if perm is not None else tuple(idx_set))
    return out


def check_foldable(program) -> str:
    """Validate that fold_long can apply; returns the folded axis letter.
    Every operand and output carrying the axis must store it trailing
    (dof-major) — folding a middle axis would not fix the sublane tiling."""
    fold_ix = fold_axis_of(program)
    assert fold_ix is not None
    for name, stored in stored_arg_layouts(program).items():
        if fold_ix in stored and stored[-1] != fold_ix:
            raise InvalidParameterError(
                f"fold_long requires the long axis {fold_ix!r} stored"
                f" trailing on {name!r} (stored layout {stored}); use"
                " dof-major arg_layouts")
    e = program.einsum
    out_idx = (tuple(e.out_idx_set[p] for p in program.descriptor.out_layout)
               if program.descriptor.out_layout is not None
               else tuple(e.out_idx_set))
    if fold_ix in out_idx and out_idx[-1] != fold_ix:
        raise InvalidParameterError(
            f"fold_long requires the long axis {fold_ix!r} stored trailing"
            f" on the output (stored layout {out_idx})")
    return fold_ix


def fold_arrays(program, arrays: dict) -> dict:
    """Reshape every stored-trailing-long operand (..., E) -> (..., f, E/f).
    Arrays must already be in their arg_layouts permutation."""
    fold_ix = fold_axis_of(program)
    if fold_ix is None:
        return arrays
    check_foldable(program)
    f = program.descriptor.fold_long
    stored = stored_arg_layouts(program)
    out = dict(arrays)
    for name, idx in stored.items():
        if fold_ix in idx:
            arr = out[name]
            length = arr.shape[-1]
            if length % f:
                raise InvalidParameterError(
                    f"fold_long={f} requires the long axis length ({length})"
                    " to be divisible by it")
            out[name] = arr.reshape(arr.shape[:-1] + (f, length // f))
    return out

# }}}
