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
``out[x?,e,i] = Σ_{s?} F[x?,s?,e] · Σ_j R[s?,i,j] · u[s?,e,j]`` —
matvec ``ij,ej->ei``, mass ``e,ij,ej->ei``, div ``es,sij,ej->ei``,
grad ``xre,rij,ej->xei``, curl-style ``e,rij,ej->ei``, and face_mass
``ifj,fe,fej->ei`` (reference tuning/impls/xre_rij_xej_to_ei*.py,
e_ij_ej_to_ei*.py, xre_rij_ej_to_xei*.py, ijf_fe_fej_to_ei*.py — all
fp64 rows).
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


class _RowPlan:
    """One batch row classified for the dd kernel (see _recognize_row)."""

    def __init__(self, u, u_idx, R, r_idx, J, j_idx, s_letter, j_letter,
                 x_letter, u_has_s):
        self.u, self.u_idx = u, tuple(u_idx)
        self.R, self.r_idx = R, tuple(r_idx)
        self.J = J
        self.j_idx = tuple(j_idx)
        self.s_letter = s_letter
        self.j_letter = j_letter
        self.x_letter = x_letter
        self.u_has_s = u_has_s


def _recognize_row(e, row):
    """Classify one batch row's operands for the dd kernel.

    The supported shape is the full reference DG family (the fp64 rows of
    tuning/impls/xre_rij_xej_to_ei*.py, e_ij_ej_to_ei*.py,
    xre_rij_ej_to_xei*.py, ijf_fe_fej_to_ei*.py):

        out[x?, e, i] = Σ_{s?} F[x?, s?, e] · Σ_j R[s?, i, j] · u[s?, e, j]

    ``u`` is the streamed dof operand (e, j) — possibly carrying ``s``
    (face_mass's flux); ``R`` the single resident over {s?, i, j}; ``F``
    an optional streamed factor over any subset of {x, s} plus e (div's
    Jacobian (e,s), grad's (x,s,e), mass/curl's (e,)); ``x`` an extra
    STATIC output axis carried only by F (grad).  For div-like rows (two
    (e, letter) streams, both letters contracted — Σ symmetric in (s, j))
    the larger letter becomes j (the unrolled inner dot) for determinism."""
    long_letters = [ix for ix, ln in e.index_to_dim_length.items()
                    if isinstance(ln, SizeParam)]
    if len(long_letters) != 1:
        raise InvalidParameterError("dd kernel needs exactly one long axis")
    el = long_letters[0]
    out = tuple(e.out_idx_set)
    if len(out) == 2 and out[0] == el:
        x_letter, i = None, out[1]
    elif len(out) == 3 and out[1] == el:
        x_letter, i = out[0], out[2]
    else:
        raise InvalidParameterError(
            "dd kernel expects output (e, i) or (x, e, i) with the long"
            " axis before i")
    streams, resident = [], []
    for arg, idx in zip(row, e.in_idx_sets):
        idx = tuple(idx)
        (streams if el in idx else resident).append((arg, idx))
    if len(resident) != 1:
        raise InvalidParameterError(
            "dd kernel needs exactly one resident operand")
    R, r_idx = resident[0]
    if i not in r_idx or el in r_idx or len(r_idx) > 3 \
            or (x_letter is not None and x_letter in r_idx):
        raise InvalidParameterError(
            "dd kernel: resident operand must be (s?, i, j)")
    contracted = [ix for ix in r_idx if ix != i]
    if not 1 <= len(contracted) <= 2 or not 1 <= len(streams) <= 2:
        raise InvalidParameterError(
            "dd kernel: unsupported operand structure (want the DG"
            " matvec/mass/div/grad/curl/face family)")

    def free(op):
        return set(op[1]) - {el}

    if len(streams) == 1:
        u_op, J_op = streams[0], None
    elif x_letter is not None:
        # grad: the factor is the operand carrying x
        withx = [op for op in streams if x_letter in op[1]]
        if len(withx) != 1:
            raise InvalidParameterError(
                "dd kernel: the extra output axis must come from exactly"
                " one streamed factor")
        J_op = withx[0]
        u_op = streams[1 - streams.index(J_op)]
    elif any(not free(op) for op in streams):
        # mass/curl: a bare (e,) factor
        J_op = next(op for op in streams if not free(op))
        u_op = streams[1 - streams.index(J_op)]
    elif any(free(a) < free(b) for a in streams for b in streams):
        # face: flux (s, e, j) carries a superset of Fj (s, e)
        u_op = max(streams, key=lambda op: len(free(op)))
        J_op = streams[1 - streams.index(u_op)]
    elif all(len(free(op)) == 1 for op in streams) \
            and {next(iter(free(op))) for op in streams} == set(contracted):
        # div: symmetric in (s, j) — larger letter = j (the inner dot)
        a, b = streams
        la, lb = next(iter(free(a))), next(iter(free(b)))
        if int(e.index_to_dim_length[la]) >= int(e.index_to_dim_length[lb]):
            u_op, J_op = a, b
        else:
            u_op, J_op = b, a
    else:
        raise InvalidParameterError(
            "dd kernel: unsupported operand structure (want the DG"
            " matvec/mass/div/grad/curl/face family)")

    j_cands = [ix for ix in free(u_op)
               if ix in contracted
               and (J_op is None or ix not in J_op[1])]
    if len(j_cands) != 1:
        raise InvalidParameterError(
            "dd kernel: cannot identify the inner dot axis")
    j_letter = j_cands[0]
    s_cands = [ix for ix in contracted if ix != j_letter]
    s_letter = s_cands[0] if s_cands else None
    # every letter must now be accounted for
    u_extra = free(u_op) - {j_letter, s_letter}
    j_extra = (free(J_op) - {x_letter, s_letter}) if J_op else set()
    if u_extra or j_extra:
        raise InvalidParameterError(
            f"dd kernel: unrecognized operand axes {u_extra | j_extra}")
    if x_letter is not None and (J_op is None or x_letter not in J_op[1]):
        raise InvalidParameterError(
            "dd kernel: the extra output axis must be carried by the"
            " streamed factor")
    return _RowPlan(
        u_op[0], u_op[1], R, r_idx,
        J_op[0] if J_op else None, J_op[1] if J_op else (),
        s_letter, j_letter, x_letter, s_letter in u_op[1])


def build_dd_executable(program, index_to_length: dict):
    """Compile the dd-pair fused kernel; returns ``fn(arrays) -> tuple`` of
    (2, [d_x,] d_i, E)-pair outputs (dof-major storage contract).  All
    operands must be stored as f32 pairs with the pair axis LEADING and the
    long axis TRAILING (dof-major): u (2, [s,] d_j, E),
    R (2, [s,] d_i, d_j), F (2, [x,] [s,] E)."""
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
    out_idx = tuple(e.out_idx_set)
    i_letter = out_idx[-1]
    d_i = int(lengths[i_letter])
    x_letter = rows[0].x_letter
    d_x = int(lengths[x_letter]) if x_letter is not None else 0
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

    # the STORED axis order of each operand = its canonical index order
    # permuted by the descriptor's arg_layouts (dofmajor_layouts may also
    # reorder residents) — shared helper so the emitter mirrors
    # _apply_layouts STRUCTURALLY, not by a second copy of the mapping
    from .layouts import stored_arg_layouts
    stored_of = stored_arg_layouts(program)
    for name in names:
        if el in arg_of[name] and stored_of[name][-1] != el:
            raise InvalidParameterError(
                f"dd kernel: streamed operand {name} must store the long"
                f" axis trailing (got {stored_of[name]})")
    # the output contract is equally load-bearing: the kernel writes
    # (2, [d_x,] d_i, B), i.e. the dof-major rotate of the logical output
    want_out = ((0, 2, 1) if x_letter is not None else (1, 0))
    if tuple(desc.out_layout or ()) != want_out:
        raise InvalidParameterError(
            f"dd kernel: out_layout must be the dof-major rotate"
            f" {want_out} (got {desc.out_layout})")

    # index maps MUST return i32 everywhere: the dd path always traces
    # under jax_enable_x64 (f64 user dtype), where literal ints become i64
    # and Mosaic rejects the mapping function ("failed to legalize
    # 'func.return'" — the r4 "relay rejects every dd module" mystery,
    # root-caused by the 2026-08-20 solo diagnostic)
    from .layouts import index_map_i32
    in_specs, full_shapes = [], []
    for name in names:
        stored = stored_of[name]
        shape, imap = stored_block(stored)
        in_specs.append(pl.BlockSpec(
            shape, index_map_i32(lambda g, _m=tuple(imap): tuple(
                g if v == "g" else v for v in _m))))
        full_shapes.append((2,) + tuple(
            int(lengths[ix]) if ix != el else L for ix in stored))
    if x_letter is not None:
        out_block = (2, d_x, d_i, block)
        out_specs = [pl.BlockSpec(out_block,
                                  index_map_i32(lambda g: (0, 0, 0, g)))
                     for _ in range(e.b)]
    else:
        out_block = (2, d_i, block)
        out_specs = [pl.BlockSpec(out_block,
                                  index_map_i32(lambda g: (0, 0, g)))
                     for _ in range(e.b)]

    def kernel(*refs):
        ins = refs[:len(names)]
        outs = refs[len(names):]
        vals = {n: r[...] for n, r in zip(names, ins)}

        def aligned(name, want):
            """The operand's block brought to the kernel-canonical axis
            order *want* (letters, pair axis implicit first)."""
            cur = stored_of[name]
            val = vals[name]
            if cur == tuple(want):
                return val
            perm = (0,) + tuple(1 + cur.index(ix) for ix in want)
            return val.transpose(perm)

        for r, plan in enumerate(rows):
            d_j = int(lengths[plan.j_letter])
            n_s = (int(lengths[plan.s_letter])
                   if plan.s_letter is not None else 1)
            uv = aligned(plan.u.name,
                         (((plan.s_letter,) if plan.u_has_s else ())
                          + (plan.j_letter, el)))   # (2, [s,] d_j, B)
            rv = aligned(plan.R.name,
                         (((plan.s_letter,)
                           if plan.s_letter is not None else ())
                          + (i_letter, plan.j_letter)))  # (2, [s,] d_i, d_j)
            j_has_s = plan.J is not None and plan.s_letter in plan.j_idx
            has_x = plan.x_letter is not None
            jv = None
            if plan.J is not None:
                jv = aligned(plan.J.name,
                             (((plan.x_letter,) if has_x else ())
                              + ((plan.s_letter,) if j_has_s else ())
                              + (el,)))             # (2, [x,] [s,] B)
            # hoist the Veltkamp splits: once per block instead of per MAC
            if not plan.u_has_s:
                u_h1, u_h2 = _split(uv[0])
            def j_dot(s):
                """V_s[i, :] = sum_j R[s?, i, j] * u[s?, j, :] in dd."""
                r_s = rv[:, s] if plan.s_letter is not None else rv
                r_h1, r_h2 = _split(r_s[0])
                if plan.u_has_s:
                    us = uv[:, s]
                    us_h1, us_h2 = _split(us[0])
                else:
                    us, us_h1, us_h2 = uv, u_h1, u_h2
                vh = vl = None
                for j in range(d_j):
                    th, tl = dd_mul_presplit(
                        r_s[0, :, j:j + 1], r_h1[:, j:j + 1],
                        r_h2[:, j:j + 1], r_s[1, :, j:j + 1],
                        us[0, j:j + 1, :], us_h1[j:j + 1, :],
                        us_h2[j:j + 1, :], us[1, j:j + 1, :])
                    if vh is None:
                        vh, vl = th, tl
                    else:
                        vh, vl = dd_add(vh, vl, th, tl)
                return vh, vl

            if has_x:
                # grad: the j-dots are independent of x, but REUSING their
                # values across the x outputs miscompiles under the
                # interpret path at grid >= 2 (XLA:CPU emits a
                # value-changing transform on the shared EFT subgraph:
                # scattered 1-2-ulp hi errors, kernel vs a strict-IEEE
                # numpy replica of the same op order; optimization_barrier
                # and stacking do NOT fix it, recomputation does —
                # 2026-08-18 standalone repro).  Recompute per x: pure ops
                # the backend may CSE back itself, and every archive
                # record re-validates at 1e-12 on the target anyway.
                for x in range(d_x):
                    acc_h = acc_l = None
                    for s in range(n_s):
                        if j_has_s:
                            fh = jv[0, x, s:s + 1, :]
                            fl = jv[1, x, s:s + 1, :]
                        else:
                            fh = jv[0, x:x + 1, :]
                            fl = jv[1, x:x + 1, :]
                        vh, vl = j_dot(s)
                        th, tl = dd_mul(vh, vl, fh, fl)
                        if acc_h is None:
                            acc_h, acc_l = th, tl
                        else:
                            acc_h, acc_l = dd_add(acc_h, acc_l, th, tl)
                    outs[r][0, x, :, :] = acc_h
                    outs[r][1, x, :, :] = acc_l
            else:
                # fused single pass: one live accumulator (matches the
                # VMEM footprint guard_vmem models)
                acc_h = acc_l = None
                for s in range(n_s):
                    vh, vl = j_dot(s)
                    if j_has_s:       # div/face: per-s streamed factor
                        vh, vl = dd_mul(vh, vl, jv[0, s:s + 1, :],
                                        jv[1, s:s + 1, :])
                    if acc_h is None:
                        acc_h, acc_l = vh, vl
                    else:
                        acc_h, acc_l = dd_add(acc_h, acc_l, vh, vl)
                if jv is not None and not j_has_s:
                    # mass/curl: one (e,) factor — cheaper AFTER the s-sum
                    acc_h, acc_l = dd_mul(acc_h, acc_l,
                                          jv[0:1, :], jv[1:2, :])
                outs[r][0, :, :] = acc_h
                outs[r][1, :, :] = acc_l

    import jax.numpy as jnp
    out_shape_core = ((2, d_x, d_i, L) if x_letter is not None
                      else (2, d_i, L))
    out_shapes = [jax.ShapeDtypeStruct(out_shape_core, jnp.float32)
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
