"""
Double-double (f32-pair) Pallas emitter: first-party fp64 on a TPU with no
f64 hardware.

XLA's f64 emulation materializes huge padded f32-pair temporaries between
ops (measured: div @ E=1M wants ~29 GB of HBM decomposed — 9.6 GOp/s even
chunked; CLAUDE.md round-2 findings).  This emitter instead keeps the
f32-pair ("double-double") arithmetic INSIDE one fused kernel: operands are
stored as (2, ...) f32 pairs (hi + lo == the f64 value, a storage contract
like dof-major), all products/sums run error-free-transformation arithmetic
on the VPU (Dekker two-prod via Veltkamp splitting — no f64 types ever
reach Mosaic), and the output comes back as a pair.  Per dd-MAC this costs
~24 f32 VPU ops, but they stream at VPU rate with zero HBM temps, where
the XLA route pays an HBM round-trip per decomposed op.

Accuracy: pair splitting keeps 48+ mantissa bits; the ~100-term DG
contractions accumulate to ~1e-13 relative — inside the f64 oracle's 1e-12
north star (the reference's archive is fp64-everywhere, BASELINE.md).

Supported family (the reference archive's DG shapes): per batch row
``out[e,i] = [J[e(,s)]] * R[(s,)i,j] . u[e,j]`` — mass ``e,ij,ej->ei``,
matvec ``ij,ej->ei``, div ``es,sij,ej->ei`` (reference
tuning/impls/xre_rij_xej_to_ei*.py and e_ij_ej_to_ei*.py, fp64 rows).
"""

from __future__ import annotations

from ..diagnostics import InvalidParameterError
from ..einsum import SizeParam

_SPLITTER = 4097.0          # 2^12 + 1 (Veltkamp split for f32: 24/2 bits)


# {{{ error-free transformations (all plain f32 jnp ops)

def _quick_two_sum(a, b):
    """|a| >= |b| assumed: s + err == a + b exactly."""
    s = a + b
    err = b - (s - a)
    return s, err


def _two_sum(a, b):
    """Knuth: s + err == a + b exactly, no magnitude assumption."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    """Veltkamp: a == hi + lo with hi, lo having 12-bit mantissas."""
    t = a * _SPLITTER
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """p + err == a * b exactly (Dekker; no FMA assumed on the VPU)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return _quick_two_sum(s, e)


def dd_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)


def dd_mul_presplit(xh, x1, x2, xl, yh, y1, y2, yl):
    """dd_mul with the Veltkamp halves (x1+x2==xh, y1+y2==yh) hoisted:
    the kernel splits each block ONCE (amortized over the j-loop, ~6 ops
    saved per dd-MAC) and, as a bonus, never runs arithmetic on the
    fragile (d,1)-lane slices themselves — only broadcast products."""
    p = xh * yh
    e = ((x1 * y1 - p) + x1 * y2 + x2 * y1) + x2 * y2
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)

# }}}


def split_to_pairs(arr):
    """f64 array -> stacked (2, ...) f32 [hi, lo] (the dd storage
    contract's host-side half; numpy or jax)."""
    import numpy as np
    if isinstance(arr, np.ndarray):
        hi = arr.astype(np.float32)
        lo = (arr - hi.astype(np.float64)).astype(np.float32)
        return np.stack([hi, lo])
    import jax.numpy as jnp
    hi = arr.astype(jnp.float32)
    lo = (arr - hi.astype(arr.dtype)).astype(jnp.float32)
    return jnp.stack([hi, lo])


def _recognize_row(e, row):
    """Classify one batch row's operands for the dd kernel.

    Returns ``(u, R, J, s_letter, j_letter)`` where ``u = (arg, j_letter)``
    streams (e, j), ``R = (arg, idx)`` is the resident matrix over
    {s?, i, j}, and ``J`` is an optional ``(arg, axes)`` streamed factor
    over (e,) or (e, s).  For div-like rows (two streamed 2-axis operands,
    both letters contracted by R — Σ_s J[e,s] Σ_j R[s,i,j] u[e,j] is
    symmetric in (s, j)) the larger letter becomes j (the unrolled inner
    loop) for determinism."""
    long_letters = [ix for ix, ln in e.index_to_dim_length.items()
                    if isinstance(ln, SizeParam)]
    if len(long_letters) != 1:
        raise InvalidParameterError("dd kernel needs exactly one long axis")
    el = long_letters[0]
    if len(e.out_idx_set) != 2 or e.out_idx_set[0] != el:
        raise InvalidParameterError(
            "dd kernel expects output (e, i) with the long axis leading")
    i = e.out_idx_set[1]
    streams2, streams1, resident = [], [], []
    for arg, idx in zip(row, e.in_idx_sets):
        idx = tuple(idx)
        if el in idx:
            if idx == (el,):
                streams1.append(arg)
            elif len(idx) == 2 and idx[0] == el:
                streams2.append((arg, idx[1]))
            else:
                raise InvalidParameterError(
                    f"dd kernel: unsupported streamed operand {idx}")
        else:
            resident.append((arg, idx))
    if len(resident) != 1:
        raise InvalidParameterError(
            "dd kernel needs exactly one resident operand")
    R = resident[0]
    r_idx = tuple(R[1])
    if i not in r_idx or len(r_idx) > 3:
        raise InvalidParameterError(
            "dd kernel: resident operand must be (s?, i, j)")
    contracted = [ix for ix in r_idx if ix != i]
    if len(streams2) == 1 and not streams1 and len(contracted) == 1:
        u, J, s_letter = streams2[0], None, None            # matvec
    elif len(streams2) == 1 and len(streams1) == 1 \
            and len(contracted) == 1:
        u, J, s_letter = streams2[0], (streams1[0], ()), None   # mass
    elif len(streams2) == 2 and not streams1 and len(contracted) == 2:
        # div: both streamed letters contracted by R; larger letter = j
        a, b = streams2
        if {a[1], b[1]} != set(contracted):
            raise InvalidParameterError(
                "dd kernel: streamed letters must match the resident's"
                " contracted axes")
        if int(e.index_to_dim_length[a[1]]) \
                >= int(e.index_to_dim_length[b[1]]):
            u, jf = a, b
        else:
            u, jf = b, a
        J, s_letter = (jf[0], (jf[1],)), jf[1]
    else:
        raise InvalidParameterError(
            "dd kernel: unsupported operand structure (want matvec/mass/"
            "div-family rows)")
    j_letter = u[1]
    if j_letter not in r_idx:
        raise InvalidParameterError(
            "dd kernel: streamed dof letter missing from the resident")
    return u, R, J, s_letter, j_letter


def build_dd_executable(program, index_to_length: dict):
    """Compile the dd-pair fused kernel; returns ``fn(arrays) -> tuple`` of
    (2, d_i, E)-pair outputs (dof-major storage contract).  All operands
    must be stored as f32 pairs with the pair axis LEADING and the long
    axis TRAILING (dof-major): u (2, d_j, E), R (2, [s,] d_i, d_j),
    J (2, [s,] E)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = program.einsum
    desc = program.descriptor
    lengths = dict(index_to_length)

    rows = [_recognize_row(e, row) for row in e.args]
    long_letters = [ix for ix, ln in e.index_to_dim_length.items()
                    if isinstance(ln, SizeParam)]
    el = long_letters[0]
    L = int(lengths[el])
    i_letter = e.out_idx_set[1]
    d_i = int(lengths[i_letter])
    block = int(min(desc.block_long, L))
    grid = (-(-L // block),)    # cdiv: pallas masks the partial tail block

    # one kernel evaluating all batch rows (shared operand DMA / CSE by
    # Mosaic); inputs ordered: unique operand names in first-use order
    names = list(dict.fromkeys(
        a.name for row in e.args for a in row))
    arg_of = {}
    for row in e.args:
        for arg, idx in zip(row, e.in_idx_sets):
            arg_of[arg.name] = tuple(idx)

    def stored_block(idx):
        shape, imap = [2], [0]
        for ix in idx:
            if ix == el:
                shape.append(block)
                imap.append("g")
            else:
                shape.append(int(lengths[ix]))
                imap.append(0)
        return tuple(shape), imap

    in_specs, full_shapes = [], []
    for name in names:
        idx = arg_of[name]
        # dof-major storage: long axis trailing
        stored = tuple([ix for ix in idx if ix != el]
                       + ([el] if el in idx else []))
        shape, imap = stored_block(stored)
        in_specs.append(pl.BlockSpec(
            shape, (lambda g, _m=tuple(imap): tuple(
                g if v == "g" else v for v in _m))))
        full_shapes.append((2,) + tuple(
            int(lengths[ix]) if ix != el else L for ix in stored))
    out_block = (2, d_i, block)
    out_specs = [pl.BlockSpec(out_block, lambda g: (0, 0, g))
                 for _ in range(e.b)]

    stored_of = {}
    for name in names:
        idx = arg_of[name]
        stored_of[name] = tuple([ix for ix in idx if ix != el]
                                + ([el] if el in idx else []))

    def kernel(*refs):
        ins = refs[:len(names)]
        outs = refs[len(names):]
        vals = {n: r[...] for n, r in zip(names, ins)}
        for r, (u, R, J, s_letter, j_letter) in enumerate(rows):
            u_name = u[0].name
            r_name = R[0].name
            r_idx = tuple(R[1])
            d_j = int(lengths[j_letter])
            n_s = int(lengths[s_letter]) if s_letter is not None else 1
            uv = vals[u_name]                 # (2, d_j, B)
            rv = vals[r_name]                 # (2, stored resident dims)
            jv = vals[J[0].name] if J is not None else None
            # resident stored axis order (no long axis): bring to (s?, i, j)
            want = tuple(ix for ix in ((s_letter,) if s_letter else ())
                         ) + (i_letter, j_letter)
            if r_idx != want:
                perm = (0,) + tuple(1 + r_idx.index(ix) for ix in want)
                rv = rv.transpose(perm)
            # hoist the Veltkamp splits: once per block instead of per MAC
            u_h1, u_h2 = _split(uv[0])
            acc_h = acc_l = None
            for s in range(n_s):
                r_s = rv[:, s] if s_letter is not None else rv  # (2,d_i,d_j)
                r_h1, r_h2 = _split(r_s[0])
                # V[i, :] = sum_j R[i, j] * u[j, :]  in dd
                vh = vl = None
                for j in range(d_j):
                    th, tl = dd_mul_presplit(
                        r_s[0, :, j:j + 1], r_h1[:, j:j + 1],
                        r_h2[:, j:j + 1], r_s[1, :, j:j + 1],
                        uv[0, j:j + 1, :], u_h1[j:j + 1, :],
                        u_h2[j:j + 1, :], uv[1, j:j + 1, :])
                    if vh is None:
                        vh, vl = th, tl
                    else:
                        vh, vl = dd_add(vh, vl, th, tl)
                if jv is not None:
                    if s_letter is not None:
                        fh, fl = jv[0, s:s + 1, :], jv[1, s:s + 1, :]
                    else:                     # jv (2, B): rows broadcast
                        fh, fl = jv[0:1, :], jv[1:2, :]
                    vh, vl = dd_mul(vh, vl, fh, fl)
                if acc_h is None:
                    acc_h, acc_l = vh, vl
                else:
                    acc_h, acc_l = dd_add(acc_h, acc_l, vh, vl)
            outs[r][0, :, :] = acc_h
            outs[r][1, :, :] = acc_l

    import jax.numpy as jnp
    out_shapes = [jax.ShapeDtypeStruct((2, d_i, L), jnp.float32)
                  for _ in range(e.b)]
    interpret = desc.interpret
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kwargs = {}
    if not interpret:
        params = dict(dimension_semantics=(desc.dimension_semantics,))
        if desc.vmem_limit_bytes:
            params["vmem_limit_bytes"] = int(desc.vmem_limit_bytes)
        kwargs["compiler_params"] = pltpu.CompilerParams(**params)

    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs)

    def fn(arrays_by_name: dict):
        ins = [arrays_by_name[n] for n in names]
        for a, shp, n in zip(ins, full_shapes, names):
            if tuple(a.shape) != shp:
                raise InvalidParameterError(
                    f"dd kernel: {n} stored shape {tuple(a.shape)} !="
                    f" expected pair layout {shp}")
        return tuple(call(*ins))

    return jax.jit(fn)
