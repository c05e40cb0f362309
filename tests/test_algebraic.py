"""Algebraic schedule rewrites (hoist/extract), parity with the reference's
loopy_utils transforms incl. the exact flop-cut assertion."""

import numpy as np
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


# {{{ expression-level CSE on traced functions (reference cse.py:45-448;
# VERDICT r3 missing #3)

def test_hoist_cses_in_jaxpr_collapses_duplicate_chains():
    import jax
    import jax.numpy as jnp

    import feinsum_tpu as f

    def g(x):
        return (2 * x + 1) * (2 * x + 1) + jnp.tanh(2 * x + 1)

    cj = jax.make_jaxpr(g)(jnp.ones(4))
    cj2 = f.hoist_cses_in_jaxpr(cj)
    # 3 traces of (mul, add) collapse to one: 9 eqns -> 5
    assert len(cj2.jaxpr.eqns) == len(cj.jaxpr.eqns) - 4
    x = jnp.asarray(np.random.default_rng(0).random(4, np.float32))
    g2 = f.hoist_cses_in_fn(g, [x])
    np.testing.assert_allclose(np.asarray(g2(x)), np.asarray(g(x)),
                               rtol=1e-6)


def test_hoist_cses_distinguishes_literals_and_params():
    import jax
    import jax.numpy as jnp

    import feinsum_tpu as f

    def g(x):
        return 2 * x + 3 * x + jnp.sum(x, axis=0) + jnp.sum(x, axis=1)

    cj = jax.make_jaxpr(g)(jnp.ones((4, 4)))
    cj2 = f.hoist_cses_in_jaxpr(cj)
    # nothing is a true duplicate: literals (2 vs 3) and params (axis 0
    # vs 1) differ
    assert len(cj2.jaxpr.eqns) == len(cj.jaxpr.eqns)
    x = jnp.asarray(np.random.default_rng(1).random((4, 4), np.float32))
    np.testing.assert_allclose(
        np.asarray(f.hoist_cses_in_fn(g, [x])(x)), np.asarray(g(x)),
        rtol=1e-6)


def test_matcher_shares_duplicated_expression_operands():
    """Two einsums over separately-traced copies of the same expression
    operand (2*J+1) must match ONE expr source and group into one b=2
    plan."""
    import jax.numpy as jnp

    import feinsum_tpu as f

    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.random((512, 3), np.float32))
    R = jnp.asarray(rng.random((3, 8, 8), np.float32))
    u = jnp.asarray(rng.random((512, 8), np.float32))
    v = jnp.asarray(rng.random((512, 8), np.float32))

    def user(J, R, u, v):
        a = jnp.einsum("es,sij,ej->ei", 2.0 * J + 1.0, R, u)
        b = jnp.einsum("es,sij,ej->ei", 2.0 * J + 1.0, R, v)
        return a + b

    fn2 = f.compile_fn_with_archive(user, [J, R, u, v])
    assert len(fn2.plans) == 1
    _ri, e, _p = fn2.plans[0]
    exprs = {a.name for row in e.args for a in row
             if a.name.startswith("expr")}
    assert len(exprs) == 1, exprs
    got = np.asarray(fn2(J, R, u, v))
    ref = np.asarray(user(J, R, u, v))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)

# }}}


def test_hoist_cses_never_rewires_live_vars_to_dropvars():
    """Review r4: two duplicate multi-output equations keeping DIFFERENT
    outputs must not CSE a live var onto the kept equation's DropVar — the
    deduped jaxpr must stay check_jaxpr-valid and numerically right."""
    import jax
    import jax.numpy as jnp

    import feinsum_tpu as f

    def g(x):
        vals, _ = jax.lax.top_k(x, 2)
        _, idxs = jax.lax.top_k(x, 2)
        return vals + idxs.astype(jnp.float32)

    x = jnp.asarray(np.random.default_rng(2).random(8, np.float32))
    cj = jax.make_jaxpr(g)(x)
    cj2 = f.hoist_cses_in_jaxpr(cj)
    jax.core.check_jaxpr(cj2.jaxpr)            # structurally valid
    np.testing.assert_allclose(
        np.asarray(f.hoist_cses_in_fn(g, [x])(x)), np.asarray(g(x)),
        rtol=1e-6)


def test_hoist_cses_recurses_into_cond_branches():
    """Duplicates INSIDE a lax.cond branch dedup and stay inside their
    branch — the jaxpr analog of the reference's predicate-guarded CSE
    temporaries (cse.py:201-299: a CSE under a predicate is initialized
    under that predicate, never unguarded)."""
    import jax
    import jax.numpy as jnp

    def branch(x):
        a = jnp.sin(x) * 2.0
        b = jnp.sin(x) * 2.0     # duplicate chain inside the branch
        return a + b

    def fn(p, x):
        return jax.lax.cond(p, branch, lambda x: x, x)

    x = jnp.ones((8,), jnp.float32)
    cj = jax.make_jaxpr(fn)(True, x)
    cj2 = f.hoist_cses_in_jaxpr(cj)
    (cond_eqn,) = [e for e in cj2.jaxpr.eqns if e.primitive.name == "cond"]
    branches = cond_eqn.params["branches"]
    n_sin = sum(sum(1 for e in b.jaxpr.eqns if e.primitive.name == "sin")
                for b in branches)
    assert n_sin == 1            # deduped, still under the predicate
    from jax.extend.core import jaxpr_as_fun
    got = jaxpr_as_fun(cj2)(True, x)[0]
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(fn(True, x)), rtol=1e-6)
    got_f = jaxpr_as_fun(cj2)(False, x)[0]
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(x))


def test_hoist_cses_merges_identical_nested_jit_calls():
    """Two pjit eqns tracing the SAME function on the SAME inputs are
    alpha-equivalent sub-jaxprs and must merge into one call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def helper(x):
        return jnp.tanh(x) + 1.0

    def fn(x):
        return helper(x) * helper(x)

    x = jnp.ones((8,), jnp.float32)
    cj = jax.make_jaxpr(fn)(x)
    n_pjit_before = sum(1 for e in cj.jaxpr.eqns
                        if e.primitive.name in ("pjit", "jit"))
    cj2 = f.hoist_cses_in_jaxpr(cj)
    n_pjit_after = sum(1 for e in cj2.jaxpr.eqns
                       if e.primitive.name in ("pjit", "jit"))
    assert n_pjit_before == 2 and n_pjit_after == 1
    from jax.extend.core import jaxpr_as_fun
    np.testing.assert_allclose(np.asarray(jaxpr_as_fun(cj2)(x)[0]),
                               np.asarray(fn(x)), rtol=1e-6)


def test_hoist_cses_never_merges_closures_over_different_consts():
    """Review r4 (confirmed by repro): alpha-equal nested-jit calls whose
    NESTED sub-jaxprs close over different constant values must NOT merge
    — the pretty-print shows consts as avals only, so values must join
    the key at every nesting depth."""
    import jax
    import jax.numpy as jnp

    def make(w):
        @jax.jit
        def h(x):
            return x * w

        @jax.jit
        def o(x):
            return h(x) + 1.0
        return o

    o1, o2 = make(2.0), make(3.0)

    def fn(x):
        return o1(x) + o2(x)

    x = jnp.ones((4,), jnp.float32)
    cj = jax.make_jaxpr(fn)(x)
    cj2 = f.hoist_cses_in_jaxpr(cj)
    from jax.extend.core import jaxpr_as_fun
    np.testing.assert_allclose(np.asarray(jaxpr_as_fun(cj2)(x)[0]),
                               np.asarray(fn(x)), rtol=1e-6)  # 7, not 6

    # and identical nested consts still merge
    o3, o4 = make(2.0), make(2.0)

    def fn2(x):
        return o3(x) + o4(x)

    cj3 = f.hoist_cses_in_jaxpr(jax.make_jaxpr(fn2)(x))
    n_jit = sum(1 for e in cj3.jaxpr.eqns
                if e.primitive.name in ("pjit", "jit"))
    assert n_jit == 1
    np.testing.assert_allclose(np.asarray(jaxpr_as_fun(cj3)(x)[0]),
                               np.asarray(fn2(x)), rtol=1e-6)
