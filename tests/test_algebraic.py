"""Algebraic schedule rewrites (hoist/extract), parity with the reference's
loopy_utils transforms incl. the exact flop-cut assertion."""

import pytest

import feinsum_tpu as f
from feinsum_tpu.measure import evaluate_giga_op_map, get_giga_op_map


def dg_grad(ndof=35):
    return f.einsum("xre,rij,ej->xei",
                    f.array("J", (3, 3, "E"), "float64"),
                    f.array("D", (3, ndof, ndof), "float64"),
                    f.array("u", ("E", ndof), "float64"))


def per_element_flops(einsum, schedule):
    return sum(evaluate_giga_op_map(
        get_giga_op_map(einsum, schedule), 1).values()) * 1e9


def test_hoist_cuts_flops_4_14x():
    e = dg_grad()
    p = f.generate_program(e)
    hoisted = f.hoist_invariant_multiplicative_terms_in_sum_reduction(p)
    trivial = per_element_flops(e, p.schedule)
    cut = per_element_flops(e, hoisted.schedule)
    assert trivial == pytest.approx(33075)
    assert cut == pytest.approx(7980)          # 4.14x, reference
    f.validate_batched_einsum_transform(e, lambda _: hoisted,
                                        long_dim_length=50)


def test_extract_positions():
    e = dg_grad(ndof=8)
    p = f.generate_program(e)
    # hoist (D, u): tmp[r,e,i] = sum_j D[r,i,j] u[e,j]
    h = f.extract_multiplicative_terms_in_sum_reduction_as_subst(p, [1, 2])
    assert h.schedule.nsteps == 2
    assert h.schedule.subscripts[0].startswith("rij,ej->")
    f.validate_batched_einsum_transform(e, lambda _: h, long_dim_length=50)
    # hoist (J, u) over x: tmp = sum over nothing... J(x,r,e) u(e,j)
    h2 = f.extract_multiplicative_terms_in_sum_reduction_as_subst(p, [0, 2])
    f.validate_batched_einsum_transform(e, lambda _: h2, long_dim_length=50)

    with pytest.raises(ValueError):
        f.extract_multiplicative_terms_in_sum_reduction_as_subst(
            p, [0, 1, 2])


def test_ttgt_impl_on_tccg():
    from feinsum_tpu.tuning import get_transform_func_from_module_path
    e = f.get_tccg_benchmark(3, dtype="float32")
    pt = get_transform_func_from_module_path("ttgt_v0")
    space = pt.get_param_space(e)
    assert set(space) == {"perm_a", "perm_b", "perm_out", "precision_idx",
                          "natural_out"}
    tr = pt.bind_args(e, perm_a=5, perm_b=1, perm_out=2, precision_idx=0)
    f.validate_batched_einsum_transform(e, tr)
    # the no-output-transpose point (GEMM-natural layout)
    tr_nat = pt.bind_args(e, perm_a=5, perm_b=1, perm_out=0,
                          precision_idx=0, natural_out=1)
    f.validate_batched_einsum_transform(e, tr_nat)
