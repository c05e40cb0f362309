"""Matcher tests: jaxpr -> BatchedEinsum (reference matcher coverage,
test_loopy_utils.py:176-228 analog) and the knowledge-transfer flow."""

import jax.numpy as jnp
import numpy as np
import pytest

import feinsum_tpu as f
from feinsum_tpu.matching import (
    abstract_long_axes,
    get_a_matched_einsum,
    match_fn_to_einsum,
)


def test_match_single_dot():
    def fn(u, D):
        return jnp.einsum("ej,ij->ei", u, D)

    e, name_map = get_a_matched_einsum(
        fn, [jnp.ones((600, 35), jnp.float32),
             jnp.ones((35, 35), jnp.float32)])
    assert e.b == 1 and e.n == 2
    assert name_map == {"u": 0, "D": 1}
    # 600 >= 500 -> parametric
    assert len(e.all_size_params) == 1
    ref = f.einsum("ej,ij->ei", f.array("x", ("E", 35), "float32"),
                   f.array("M", (35, 35), "float32"))
    assert f.canonicalize_einsum(e) == f.canonicalize_einsum(ref)


def test_match_three_operand_grad():
    def fn(J, D, u):
        return jnp.einsum("xre,rij,ej->xei", J, D, u)

    e, _ = get_a_matched_einsum(
        fn, [jnp.ones((3, 3, 700), jnp.float32),
             jnp.ones((3, 35, 35), jnp.float32),
             jnp.ones((700, 35), jnp.float32)])
    ref = f.einsum("xre,rij,ej->xei",
                   f.array("J", (3, 3, "E"), "float32"),
                   f.array("D", (3, 35, 35), "float32"),
                   f.array("u", ("E", 35), "float32"))
    assert f.canonicalize_einsum(e) == f.canonicalize_einsum(ref)


def test_match_elementwise_and_reduction():
    def prod(a, b):
        return jnp.einsum("ij,ij->ij", a, b)

    e, _ = get_a_matched_einsum(
        prod, [jnp.ones((600, 35), jnp.float32)] * 2)
    assert e.sum_indices == ()

    def rowsum(a):
        return jnp.einsum("ij->i", a)

    e2, _ = get_a_matched_einsum(rowsum, [jnp.ones((600, 35), jnp.float32)])
    assert len(e2.sum_indices) == 1


def test_match_batched_rows():
    def fn(Jx, Jy, R, ux, uy):
        return (jnp.einsum("es,sij,ej->ei", Jx, R, ux),
                jnp.einsum("es,sij,ej->ei", Jy, R, uy))

    args = [jnp.ones((600, 3), jnp.float32), jnp.ones((600, 3), jnp.float32),
            jnp.ones((3, 8, 8), jnp.float32), jnp.ones((600, 8), jnp.float32),
            jnp.ones((600, 8), jnp.float32)]
    e, _ = get_a_matched_einsum(fn, args)
    assert e.b == 2
    assert e.arg_to_shape["R"] == (3, 8, 8)


def test_match_inside_nonlinear_epilogue():
    """r3: a nonlinearity wrapping an einsum no longer rejects — the inner
    einsum is matched and the tanh is epilogue (reference parity:
    match_t_unit_to_einsum matches the einsum inside a larger kernel,
    loopy_utils/__init__.py:471-506)."""
    def fn(a, b):
        return jnp.tanh(a @ b)

    einsum, name_map = get_a_matched_einsum(
        fn, [jnp.ones((600, 8), jnp.float32),
             jnp.ones((8, 8), jnp.float32)])
    assert name_map == {"a": 0, "b": 1}
    assert len(einsum.out_idx_set) == 2


def test_knowledge_transfer_flow():
    """The core product promise (reference test_loopy_utils.py:145-173): a
    transform recorded against a reference einsum applies to a user's
    differently-named computation."""
    ref = f.einsum("xre,rij,ej->xei",
                   f.array("Jac", (3, 3, "E"), "float32"),
                   f.array("Dmat", (3, 35, 35), "float32"),
                   f.array("dofs", ("E", 35), "float32"))

    def user_fn(a_jac, a_mat, a_u):
        return jnp.einsum("spn,pdq,nq->snd", a_jac, a_mat, a_u)

    args = [jnp.ones((3, 3, 900), jnp.float32),
            jnp.ones((3, 35, 35), jnp.float32),
            jnp.ones((900, 35), jnp.float32)]
    subst = match_fn_to_einsum(user_fn, args, ref)
    assert subst["Jac"] == "a_jac"
    assert subst["Dmat"] == "a_mat"
    assert subst["dofs"] == "a_u"
    # indices map onto the matched einsum's letters; the long axis must map
    # to the matched einsum's parametric axis
    matched, _ = get_a_matched_einsum(user_fn, args)
    assert set(subst[ix] for ix in "xrije") == set(matched.all_indices)
    from feinsum_tpu.einsum import SizeParam
    assert isinstance(matched.index_to_dim_length[subst["e"]], SizeParam)


def _rhs_args(ndof=8, nf=4, nfdof=6, E=2048):
    return [jnp.ones((E, 3), jnp.float32), jnp.ones((3, ndof, ndof),
            jnp.float32), jnp.ones((E, ndof), jnp.float32),
            jnp.ones((ndof, nf, nfdof), jnp.float32),
            jnp.ones((nf, E), jnp.float32),
            jnp.ones((nf, E, nfdof), jnp.float32)]


def _user_rhs(J, D, u, L, F, flux):
    """div(u) + lift(flux) with a literal scalar factor: the composite shape
    the round-1 matcher could not express (VERDICT.md missing #2)."""
    vol = jnp.einsum("es,sij,ej->ei", J, D, u)
    surf = jnp.einsum("ifj,fe,fej->ei", L, F, flux)
    return 2.0 * vol - surf


def test_match_sum_of_einsums_requires_insn_match():
    with pytest.raises(f.EinsumMatchError, match="insn_match"):
        get_a_matched_einsum(_user_rhs, _rhs_args())


def test_match_sum_of_einsums_selection():
    from feinsum_tpu.matching import get_matched_einsums

    args = _rhs_args()
    insns = get_matched_einsums(_user_rhs, args)
    assert len(insns) == 2
    div_ref = f.einsum("es,sij,ej->ei",
                       f.array("J", ("E", 3), "float32"),
                       f.array("D", (3, 8, 8), "float32"),
                       f.array("u", ("E", 8), "float32"))
    lift_ref = f.einsum("ifj,fe,fej->ei",
                        f.array("L", (8, 4, 6), "float32"),
                        f.array("F", (4, "E"), "float32"),
                        f.array("flux", (4, "E", 6), "float32"))

    # selection by predicate over operand names, by pair, and by flat index
    by_pred, nm = get_a_matched_einsum(
        _user_rhs, args, insn_match=lambda i: "flux" in i.arg_names)
    assert f.canonicalize_einsum(by_pred) == f.canonicalize_einsum(lift_ref)
    assert nm == {"L": 3, "F": 4, "flux": 5}   # only the operands it reads
    by_pair, _ = get_a_matched_einsum(_user_rhs, args, insn_match=(0, 0))
    assert f.canonicalize_einsum(by_pair) == f.canonicalize_einsum(div_ref)
    by_flat, _ = get_a_matched_einsum(_user_rhs, args, insn_match=1)
    assert f.canonicalize_einsum(by_flat) == f.canonicalize_einsum(lift_ref)

    # the knowledge-transfer flow composes with insn_match
    subst = match_fn_to_einsum(_user_rhs, args, div_ref,
                               insn_match=lambda i: "D" in i.arg_names)
    assert subst["J"] == "J" and subst["u"] == "u"

    # enumeration agrees with direct selection
    assert [info.arg_names for _, _, info in insns] == [
        ("u", "J", "D"), ("F", "flux", "L")]


def test_match_insn_match_no_hit_is_precise():
    with pytest.raises(f.EinsumMatchError, match="selected no instruction"):
        get_a_matched_einsum(_user_rhs, _rhs_args(),
                             insn_match=lambda i: False)


def test_match_scalar_literal_factor_passthrough():
    def fn(u, D):
        return 0.5 * jnp.einsum("ej,ij->ei", u, D)

    e, _ = get_a_matched_einsum(fn, [jnp.ones((600, 35), jnp.float32),
                                     jnp.ones((35, 35), jnp.float32)])
    ref = f.einsum("ej,ij->ei", f.array("u", ("E", 35), "float32"),
                   f.array("D", (35, 35), "float32"))
    assert f.canonicalize_einsum(e) == f.canonicalize_einsum(ref)


def test_match_sum_operand_becomes_expression():
    def fn(a, b, M):
        return jnp.einsum("ej,ij->ei", a + b, M)

    # a+b feeding a product is cut at the boundary: it becomes ONE opaque
    # expression operand (the substitution-rule seam, reference
    # codegen/loopy.py:94-95,156-168), not a product-of-sums error
    e, nm = get_a_matched_einsum(fn, [jnp.ones((600, 8), jnp.float32),
                                      jnp.ones((600, 8), jnp.float32),
                                      jnp.ones((8, 8), jnp.float32)])
    ref = f.einsum("ej,ij->ei", f.array("x", ("E", 8), "float32"),
                   f.array("M", (8, 8), "float32"))
    assert f.canonicalize_einsum(e) == f.canonicalize_einsum(ref)
    # the expression operand maps to the input positions feeding it
    assert nm["expr0"] == (0, 1)
    assert nm["M"] == 2


def test_match_operand_expression_seam():
    """VERDICT r2 missing #1: an operand that is an arbitrary expression
    (2*J + 1 — affine, outside the grammar via the scalar offset) matches,
    with the expression as an opaque operand."""
    def fn(J, u, D):
        return jnp.einsum("e,ej,ij->ei", 2.0 * J + 1.0, u, D)

    e, nm = get_a_matched_einsum(
        fn, [jnp.ones((600,), jnp.float32),
             jnp.ones((600, 8), jnp.float32),
             jnp.ones((8, 8), jnp.float32)])
    ref = f.einsum("e,ej,ij->ei",
                   f.array("jac", ("E",), "float32"),
                   f.array("x", ("E", 8), "float32"),
                   f.array("M", (8, 8), "float32"))
    assert f.canonicalize_einsum(e) == f.canonicalize_einsum(ref)
    assert nm["expr0"] == (0,)
    assert nm == {"expr0": (0,), "u": 1, "D": 2}


def test_match_nonlinear_expression_operand():
    # exp(u) feeding a contraction: the exp subtree is the operand
    def fn(u, D):
        return jnp.exp(u) @ D

    e, nm = get_a_matched_einsum(fn, [jnp.ones((600, 8), jnp.float32),
                                      jnp.ones((8, 8), jnp.float32)])
    assert e.n == 2
    assert nm["expr0"] == (0,)


def test_match_captured_constant_operand():
    M = jnp.ones((8, 8), jnp.float32)

    def fn(u):
        return jnp.einsum("ej,ij->ei", u, M)

    e, nm = get_a_matched_einsum(fn, [jnp.ones((600, 8), jnp.float32)])
    ref = f.einsum("ej,ij->ei", f.array("x", ("E", 8), "float32"),
                   f.array("M", (8, 8), "float32"))
    assert f.canonicalize_einsum(e) == f.canonicalize_einsum(ref)
    assert nm["u"] == 0
    assert nm["expr0"] == ()     # captured const: no feeding inputs


def test_insn_scale_tracking():
    """ADVICE r2: InsnInfo records each instruction's sign and literal
    scalar factor so a caller can reconstruct fn's value."""
    from feinsum_tpu.matching import get_matched_einsums

    insns = get_matched_einsums(_user_rhs, _rhs_args())
    assert [info.scale for _, _, info in insns] == [2.0, -1.0]

    def fn(u, D, alpha):
        return -(alpha * jnp.einsum("ej,ij->ei", u, D))

    insns2 = get_matched_einsums(
        fn, [jnp.ones((600, 8), jnp.float32),
             jnp.ones((8, 8), jnp.float32),
             jnp.float32(3.0)])
    # traced scalar factor -> captured as a scale_var (evaluable from the
    # inputs); the neg's sign stays on scale
    info2 = insns2[0][2]
    assert info2.scale == -1.0
    assert len(info2.scale_vars) == 1


def test_match_inside_scalar_offset_epilogue():
    """r3: a scalar offset is epilogue, not a rejection — the einsum under
    it still matches (its sum structure is cut at the offset)."""
    def fn(u, D):
        return jnp.einsum("ej,ij->ei", u, D) + 1.0

    einsum, name_map = get_a_matched_einsum(
        fn, [jnp.ones((600, 8), jnp.float32),
             jnp.ones((8, 8), jnp.float32)])
    assert name_map == {"u": 0, "D": 1}


def test_match_still_rejects_pure_non_einsum():
    def fn(u):
        return jnp.tanh(u)

    with pytest.raises(f.EinsumMatchError,
                       match="outside the batched-einsum"):
        get_a_matched_einsum(fn, [jnp.ones((600, 8), jnp.float32)])


def test_abstract_long_axes():
    e = f.einsum("ej,ij->ei",
                 f.array("u", (100_000, 35), "float32"),
                 f.array("D", (35, 35), "float32"))
    a = abstract_long_axes(e)
    assert len(a.all_size_params) == 1
    ref = f.einsum("ej,ij->ei", f.array("u", ("E", 35), "float32"),
                   f.array("D", (35, 35), "float32"))
    assert f.canonicalize_einsum(a) == f.canonicalize_einsum(ref)


def test_match_curl_component_difference():
    """The Maxwell/curl pattern — a DIFFERENCE of two div-class einsums —
    matches per-addend via insn_match, and each addend is isomorphic to the
    archived div class (the knowledge-transfer story for cross-product
    operators; reference re_rji_ej_to_ei_3d_cross_product_v0)."""
    import numpy as np

    def curl_x(Jy, Jz, D, Fz, Fy):
        return (jnp.einsum("es,sij,ej->ei", Jy, D, Fz)
                - jnp.einsum("es,sij,ej->ei", Jz, D, Fy))

    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.random(s, np.float32)) for s in
            ((600, 3), (600, 3), (3, 7, 7), (600, 7), (600, 7))]
    e0, m0 = get_a_matched_einsum(curl_x, args, insn_match=0)
    e1, m1 = get_a_matched_einsum(curl_x, args, insn_match=1)
    ref = f.einsum("es,sij,ej->ei",
                   f.array("J", ("E", 3), "float32"),
                   f.array("D", (3, 7, 7), "float32"),
                   f.array("u", ("E", 7), "float32"))
    assert f.canonicalize_einsum(e0) == f.canonicalize_einsum(ref)
    assert f.canonicalize_einsum(e1) == f.canonicalize_einsum(ref)
    # the name maps land on the right operands per term
    assert {"Jy", "D", "Fz"} <= set(m0)
    assert {"Jz", "D", "Fy"} <= set(m1)


def test_scalar_einsum_sums_still_match():
    """Regression (r3 review #3): sums of rank-0 einsum terms are
    legitimate instructions, not scalar offsets."""
    from feinsum_tpu.matching import get_matched_einsums

    def fn(u, v):
        return (jnp.einsum("ej,ej->", u, u)
                + jnp.einsum("ej,ej->", u, v))

    insns = get_matched_einsums(
        fn, [jnp.ones((600, 8), jnp.float32)] * 2)
    assert len(insns) == 2
    assert all(e.out_idx_set == () for e, _nm, _i in insns)


def test_scalar_literal_times_traced_scalar_orders():
    """Regression (r3 review #4): (alpha * 2.0) and (2.0 * alpha) factors
    behave identically — the traced scalar product is captured as ONE
    scale_var, no literal rejection."""
    from feinsum_tpu.matching import get_matched_einsums

    for expr in (lambda a: a * 2.0, lambda a: 2.0 * a):
        def fn(u, D, alpha, _e=expr):
            return _e(alpha) * jnp.einsum("ej,ij->ei", u, D)

        insns = get_matched_einsums(
            fn, [jnp.ones((600, 8), jnp.float32),
                 jnp.ones((8, 8), jnp.float32), jnp.float32(3.0)])
        info = insns[0][2]
        assert info.scale is not None
        assert len(info.scale_vars) == 1


def test_match_constant_folded_operands():
    """r3 review #1: structural primitives over literals (jnp.ones ->
    broadcast_in_dim of a scalar Literal, transposed/cast constants) route
    through the opaque-expression seam instead of raising."""
    u = jnp.ones((600, 8), jnp.float32)
    M = jnp.ones((8, 8), jnp.float32)

    # additive constant feeding a product: operand expr depending on u
    def fn(u, M):
        return jnp.einsum("ej,ij->ei", u + jnp.ones((600, 8), jnp.float32),
                          M)

    e, nm = get_a_matched_einsum(fn, [u, M])
    assert e.n == 2
    (expr_name,) = [k for k in nm if k.startswith("expr")]
    assert nm[expr_name] == (0,)

    # multiplicative constant (transposed twice = structural over opaque):
    # a captured const operand with no input deps
    def fn2(u, M):
        c = jnp.ones((600, 8), jnp.float32).T.T
        return jnp.einsum("ej,ij->ei", u * c, M)

    e2, nm2 = get_a_matched_einsum(fn2, [u, M])
    assert any(v == () for v in nm2.values())

    # reducing a constant is a constant (not a grammar contraction)
    def fn3(u, M):
        s = jnp.sum(jnp.ones((8, 8), jnp.float32), axis=0)  # (8,) const
        return jnp.einsum("ej,ij->ei", u * s[None, :], M)

    e3, nm3 = get_a_matched_einsum(fn3, [u, M])
    assert e3.n >= 2


def test_get_matched_einsums_enumerates_epilogue_frontier():
    """Frontier instructions (einsums feeding a non-grammar epilogue) are
    enumerated with out_index >= the number of traced outputs."""
    def fn(u, D):
        a = jnp.einsum("ej,ij->ei", u, D)
        return jnp.tanh(a)

    triples = f.get_matched_einsums(
        fn, [jnp.ones((600, 8), jnp.float32),
             jnp.ones((8, 8), jnp.float32)])
    assert len(triples) == 1
    _einsum, name_map, info = triples[0]
    assert info.out_index >= 1     # frontier slot, not traced output 0
    assert name_map == {"u": 0, "D": 1}
