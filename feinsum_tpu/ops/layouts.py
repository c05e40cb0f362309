"""
Layout inference for streamed operands.

Measured on TPU v5e (scripts/tpu_layout_probe.py): blocks shaped
``(block, ndof)`` with a short trailing axis DMA 4*ndof-byte row fragments at
~23% of HBM peak, while the same data with the long axis on the dense lane
dimension streams at ~70-84%.  ``dofmajor_layouts`` computes the argument and
output permutations that rotate every parametric (long) axis to the back.
"""

from __future__ import annotations

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
