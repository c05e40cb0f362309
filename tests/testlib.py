"""Shared test helpers: random batched-einsum generator and isomorphism
renaming, modeling the reference's fuzz strategy (test/testlib.py:275-415)."""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

import feinsum_tpu as f


def _operand_names():
    for i in range(26):
        yield chr(ord("A") + i)
    for i in range(26):
        for j in range(26):
            yield chr(ord("A") + i) + chr(ord("A") + j)


def generate_batched_einsum(rng: np.random.Generator, *, max_dim_size: int = 7
                            ) -> f.BatchedEinsum:
    """Random valid batched einsum: b in [1,16], n in [1,8], up to 7 free and
    7 reduction indices, axis lengths from {4,8,16,32,64}, dtypes from
    {f16,f32,f64}, with random operand reuse."""
    b = int(rng.integers(1, 17))
    n = int(rng.integers(1, 9))
    n_free = int(rng.integers(1, 8))
    n_redn = int(rng.integers(0, 8))
    out_idx = tuple(chr(97 + (i + 8) % 26) for i in range(n_free))
    redn_idx = tuple(chr(97 + (i + n_free + 8) % 26) for i in range(n_redn))
    all_idx = out_idx + redn_idx
    lengths = [4, 8, 16, 32, 64]
    dtypes = [np.float16, np.float32, np.float64]
    names = _operand_names()

    def make_in_idx_lists():
        return tuple(
            tuple(str(rng.choice(all_idx))
                  for _ in range(int(rng.integers(0, max_dim_size + 1))))
            for _ in range(n))

    in_idx_lists = make_in_idx_lists()
    while not (set(sum(in_idx_lists, start=())) >= set(out_idx)):
        in_idx_lists = make_in_idx_lists()

    idx_len = {ix: int(rng.choice(lengths)) for ix in all_idx}
    pos_dtype = [[np.dtype(rng.choice(dtypes)) for _ in range(n)]
                 for _ in range(b)]
    by_sig: dict = {}
    arg_rows = []
    arg_dtype: dict = {}
    arg_shape: dict = {}
    for i in range(b):
        row = []
        for j, idx_list in enumerate(in_idx_lists):
            shape = tuple(idx_len[ix] for ix in idx_list)
            dt = pos_dtype[i][j]
            sig = (shape, dt)
            if sig in by_sig and bool(rng.choice([False, True], p=[0.3, 0.7])):
                name = str(rng.choice(by_sig[sig]))
            else:
                name = next(names)
                by_sig.setdefault(sig, []).append(name)
                arg_dtype[name] = dt
                arg_shape[name] = shape
            row.append(name)
        arg_rows.append(row)

    subs = (",".join("".join(s) for s in in_idx_lists)
            + " -> " + "".join(out_idx))
    return f.batched_einsum(subs, [
        [f.array(nm, arg_shape[nm], arg_dtype[nm]) for nm in row]
        for row in arg_rows])


def apply_renaming_to_batched_einsum(
        e1: f.BatchedEinsum, sigma_i: Sequence[int], sigma_j: Sequence[int],
        sigma_idx: Mapping[str, str], sigma_arg: Mapping[str, str]
) -> f.BatchedEinsum:
    """Produce an einsum isomorphic to *e1* by permuting rows (*sigma_i*),
    operand positions (*sigma_j*), and renaming indices/args."""
    assert sorted(sigma_i) == list(range(len(sigma_i)))
    assert sorted(sigma_j) == list(range(len(sigma_j)))
    out_idx = tuple(sigma_idx[ix] for ix in e1.out_idx_set)
    in_idx = tuple(tuple(sigma_idx[ix] for ix in e1.in_idx_sets[j])
                   for j in sigma_j)
    subs = ",".join("".join(s) for s in in_idx) + " -> " + "".join(out_idx)
    return f.batched_einsum(subs, [
        [e1.args[i][j].copy(name=sigma_arg[e1.args[i][j].name])
         for j in sigma_j]
        for i in sigma_i])


def make_dg_div(ndim=3, ndofs=35, dtype="float64", names=("Jx", "Jy", "Jz"),
                us=("ux", "uy", "uz")):
    """The DG divergence batched einsum ('es,sij,ej->ei', b=3)."""
    return f.batched_einsum(
        "es, sij, ej -> ei",
        [[f.array(jn, ("E", ndim), dtype),
          f.array("R", (ndim, ndofs, ndofs), dtype),
          f.array(un, ("E", ndofs), dtype)]
         for jn, un in zip(names, us)])
