"""Canonicalization tests, mirroring the reference's coverage
(test/test_feinsum.py:34-311): DG isomorphisms, automorphic vertices, large
graphs, and the 1024-case renaming fuzz test."""

import numpy as np
import pytest

import feinsum_tpu as f
from testlib import (apply_renaming_to_batched_einsum, generate_batched_einsum,
                     make_dg_div)


def iso(e1, e2):
    return f.canonicalize_einsum(e1) == f.canonicalize_einsum(e2)


def test_dg_div_isomorphism():
    e1 = make_dg_div()
    e2 = f.batched_einsum(
        "td, dkl, tl -> tk",
        [[f.array("Jacx", ("E", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("x_dofs", ("E", 35))],
         [f.array("Jacy", ("E", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("y_dofs", ("E", 35))],
         [f.array("Jacz", ("E", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("z_dofs", ("E", 35))]])
    # same u in all rows => NOT isomorphic to distinct-u version
    e3 = f.batched_einsum(
        "td, dkl, tl -> tk",
        [[f.array("Jacx", ("E", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("u", ("E", 35))],
         [f.array("Jacy", ("E", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("u", ("E", 35))],
         [f.array("Jacz", ("E", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("u", ("E", 35))]])
    e4 = make_dg_div(dtype="float32")

    assert iso(e1, e2)
    # canonicalization is idempotent
    assert iso(f.canonicalize_einsum(e1), f.canonicalize_einsum(e2))
    assert not iso(e2, e3)
    assert not iso(e1, e4)


def test_canonicalization_with_automorphic_vertices():
    assert iso(
        f.einsum("ij,ik->i",
                 f.array("A", ("I", 10), np.float64),
                 f.array("B", ("I", 10), np.float32)),
        f.einsum("ik,ij->i",
                 f.array("C", ("J", 10), np.float32),
                 f.array("D", ("J", 10), np.float64)))

    assert not iso(
        f.einsum("ijk,ij,ik->i",
                 f.array("A", ("I", 10, 10), np.float64),
                 f.array("B", ("I", 10), np.float64),
                 f.array("C", ("I", 10), np.float32)),
        f.einsum("ijk,ij,ik->i",
                 f.array("A", ("I", 10, 10), np.float64),
                 f.array("B", ("I", 10), np.float32),
                 f.array("C", ("I", 10), np.float64)))

    assert iso(
        f.einsum("ijk,ij,ik->i",
                 f.array("A", ("I", 10, 10), np.float64),
                 f.array("B", ("I", 10), np.float64),
                 f.array("C", ("I", 10), np.float64)),
        f.einsum("ijk,ik,ij->i",
                 f.array("P", ("J", 10, 10), np.float64),
                 f.array("Q", ("J", 10), np.float64),
                 f.array("R", ("J", 10), np.float64)))

    assert not iso(
        f.batched_einsum("ijk,ik,ij,ij->i", [
            [f.array("A", ("I", 10, 10)), f.array("B", ("I", 10)),
             f.array("C", ("I", 10)), f.array("D", ("I", 10))]]),
        f.batched_einsum("ijk,ik,ij,ik->i", [
            [f.array("P", ("L", 10, 10)), f.array("Q", ("L", 10)),
             f.array("R", ("L", 10)), f.array("S", ("L", 10))]]))

    assert iso(
        f.batched_einsum("ijk,ik,ij,ij->i", [
            [f.array("A", ("I", 10, 10)), f.array("B", ("I", 10)),
             f.array("C", ("I", 10)), f.array("D", ("I", 10))]]),
        f.batched_einsum("ikj,ik,ij,ik->i", [
            [f.array("P", ("L", 10, 10)), f.array("Q", ("L", 10)),
             f.array("R", ("L", 10)), f.array("S", ("L", 10))]]))

    assert iso(
        f.batched_einsum("ijk,ik,ij,ij->i", [
            [f.array("A", ("I", 10, 10)), f.array("B", ("I", 10)),
             f.array("C", ("I", 10)), f.array("D", ("I", 10))],
            [f.array("A", ("I", 10, 10)), f.array("B", ("I", 10)),
             f.array("C", ("I", 10)), f.array("B", ("I", 10))]]),
        f.batched_einsum("elm,em,el,el->e", [
            [f.array("P", ("J", 10, 10)), f.array("Q", ("J", 10)),
             f.array("R", ("J", 10)), f.array("Q", ("J", 10))],
            [f.array("P", ("J", 10, 10)), f.array("Q", ("J", 10)),
             f.array("R", ("J", 10)), f.array("S", ("J", 10))]]))


def test_visualize_smoke(tmp_path):
    """DOT dump of the induced colored digraph (reference parity:
    canonicalization.py:235-276)."""
    e = make_dg_div()
    dot = f.visualize(e)
    assert dot.startswith("digraph")
    # one vertex per entity: every arg name and index letter shows up
    for name in e.all_args:
        assert f"arg {name}" in dot
    for ix in e.all_indices:
        assert f"idx {ix}" in dot
    assert "->" in dot
    out = tmp_path / "g.dot"
    assert f.visualize(e, str(out)) == out.read_text()


def test_canonical_names():
    e = f.canonicalize_einsum(make_dg_div())
    assert e.all_args <= {f"arg_{i}" for i in range(len(e.all_args))}
    assert all(len(ix) == 1 for ix in e.all_indices)
    assert {p.name for p in e.all_size_params} == {"N_0"}


def test_substitution_mapping():
    e1 = make_dg_div()
    e2 = f.batched_einsum(
        "td, dkl, tl -> tk",
        [[f.array("Jacx", ("EL", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("x_dofs", ("EL", 35))],
         [f.array("Jacy", ("EL", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("y_dofs", ("EL", 35))],
         [f.array("Jacz", ("EL", 3)), f.array("ref_mat", (3, 35, 35)),
          f.array("z_dofs", ("EL", 35))]])
    subst = f.get_substitution_mapping_between_isomorphic_batched_einsums(
        e1, e2)
    assert subst["R"] == "ref_mat"
    assert subst["e"] == "t"
    assert subst["s"] == "d"
    assert subst["i"] == "k"
    assert subst["j"] == "l"
    assert subst["E"] == "EL"
    # J's map to J's, u's to u's (order within may differ)
    assert {subst["Jx"], subst["Jy"], subst["Jz"]} == {
        "Jacx", "Jacy", "Jacz"}
    assert {subst["ux"], subst["uy"], subst["uz"]} == {
        "x_dofs", "y_dofs", "z_dofs"}
    # consistency: renaming e1 with subst must reproduce an einsum isomorphic
    # to e2 with matched (J, u) pairing per batch row
    pair1 = {subst[row[0].name]: subst[row[2].name] for row in e1.args}
    pair2 = {row[0].name: row[2].name for row in e2.args}
    assert pair1 == pair2

    with pytest.raises(ValueError):
        f.get_substitution_mapping_between_isomorphic_batched_einsums(
            e1, make_dg_div(dtype="float32"))


def test_canonicalization_of_large_graphs():
    expr1 = f.batched_einsum(
        "ij,ej->ei",
        [[f.array(f"u{i}", (35, 35)), f.array(f"v{i}", ("E", 35))]
         for i in range(500)])
    expr2 = f.batched_einsum(
        "et,st->es",
        [[f.array(f"a{i}", ("E", 35)), f.array(f"b{i}", (35, 35))]
         for i in range(500)])
    assert iso(expr1, expr2)


def test_canonicalization_fuzz():
    rng = np.random.default_rng(0)
    n_cases = 1024
    for _ in range(n_cases):
        e = generate_batched_einsum(rng)
        arg_names = tuple(sorted(e.all_args))
        indices = tuple(sorted(e.all_indices))
        sigma_i = [int(x) for x in rng.permutation(range(e.b))]
        sigma_j = [int(x) for x in rng.permutation(range(e.n))]
        sigma_idx = dict(zip(indices, (str(s) for s in
                                       rng.permutation(indices))))
        sigma_arg = dict(zip(arg_names, (str(s) for s in
                                         rng.permutation(arg_names))))
        renamed = apply_renaming_to_batched_einsum(
            e, sigma_i, sigma_j, sigma_idx, sigma_arg)
        assert f.canonicalize_einsum(e) == f.canonicalize_einsum(renamed)


def test_python_fallback_agrees_with_native():
    from feinsum_tpu.canonicalization import _EinsumGraph, _get_native
    from feinsum_tpu.native.canon_py import canonical_labeling_py
    if _get_native() is None:
        pytest.skip("native core unavailable")
    import feinsum_tpu.canonicalization as canon

    rng = np.random.default_rng(7)
    for _ in range(25):
        e = generate_batched_einsum(rng)
        g = _EinsumGraph(e)
        native_perm = canon._canonical_labeling(g.n, g.colors, g.edges)
        py_perm = canonical_labeling_py(g.n, list(g.colors), list(g.edges))
        # both must induce the same canonical graph
        def relabel(perm):
            cols = [None] * g.n
            for v in range(g.n):
                cols[perm[v]] = g.colors[v]
            edges = sorted((perm[u], perm[v]) for (u, v) in g.edges)
            return (cols, edges)
        assert relabel(native_perm) == relabel(py_perm)
