"""IR + builder tests (modeled on the reference's API contract)."""

import numpy as np
import pytest

import feinsum_tpu as f


def test_einsum_basic_properties():
    e = f.einsum("ij,jk->ik",
                 f.array("A", (10, 20), "float32"),
                 f.array("B", (20, 30), "float32"))
    assert e.b == 1
    assert e.n == 2
    assert e.shape == (10, 30)
    assert e.ndim == 2
    assert e.index_to_dim_length == {"i": 10, "j": 20, "k": 30}
    assert e.sum_indices == ("j",)
    assert e.get_subscripts() == "ij,jk -> ik"
    assert e.arg_to_shape == {"A": (10, 20), "B": (20, 30)}
    assert e.arg_to_dtype == {"A": np.dtype("float32"),
                              "B": np.dtype("float32")}
    assert e.index_to_access_descr["i"] == f.FreeAxis(0)
    assert e.index_to_access_descr["k"] == f.FreeAxis(1)
    assert e.index_to_access_descr["j"] == f.SummationAxis(0)


def test_size_param_axes():
    e = f.einsum("ej,ij->ei",
                 f.array("u", ("E", 35)),
                 f.array("D", (35, 35)))
    assert e.all_size_params == frozenset({f.SizeParam("E")})
    assert e.shape == (f.SizeParam("E"), 35)
    assert isinstance(e.index_to_dim_length["e"], f.SizeParam)


def test_implicit_mode_rejected():
    with pytest.raises(ValueError):
        f.batched_einsum("ij,jk", [[f.array("A", (4, 4)),
                                    f.array("B", (4, 4))]])


def test_ellipsis_rejected():
    with pytest.raises(NotImplementedError):
        f.einsum("...ij,jk->...ik",
                 f.array("A", (4, 4)), f.array("B", (4, 4)))


def test_shape_mismatch_rejected():
    with pytest.raises(TypeError):
        f.einsum("ij,jk->ik",
                 f.array("A", (10, 21)), f.array("B", (20, 30)))


def test_inconsistent_dtype_same_name_rejected():
    with pytest.raises(TypeError):
        f.batched_einsum("ij->i", [
            [f.array("A", (4, 4), "float32")],
            [f.array("A", (4, 4), "float64")],
        ])


def test_out_index_not_in_inputs_rejected():
    with pytest.raises(TypeError):
        f.einsum("ij->ik", f.array("A", (4, 4)))


def test_duplicate_output_index_rejected():
    with pytest.raises(ValueError):
        f.einsum("ij->ii", f.array("A", (4, 4)))


def test_batched_einsum_shape_consistency():
    e = f.batched_einsum("es,sij,ej->ei", [
        [f.array("Jx", ("E", 3)), f.array("R", (3, 35, 35)),
         f.array("ux", ("E", 35))],
        [f.array("Jy", ("E", 3)), f.array("R", (3, 35, 35)),
         f.array("uy", ("E", 35))],
    ])
    assert e.b == 2
    assert e.n == 3
    assert e.sum_indices == ("s", "j")


def test_str_smoke():
    e = f.einsum("ij,jk->ik", f.array("A", (10, 20)), f.array("B", (20, 30)))
    s = str(e)
    assert "_fe_out" in s
    assert "A[i, j]" in s


def test_tccg_benchmark_getter():
    for i in range(48):
        e = f.get_tccg_benchmark(i + 1)
        assert isinstance(e, f.BatchedEinsum)
        assert e.n == 2
    with pytest.raises(ValueError):
        f.get_tccg_benchmark(49)


def test_index_name_generator():
    gen = f.IndexNameGenerator(frozenset({"a", "c"}))
    assert (gen(), gen(), gen()) == ("b", "d", "e")


def test_utils_redn_helpers():
    from feinsum_tpu.utils import get_n_redn_dim, is_any_redn_dim_parametric
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 35)), f.array("D", (35, 35)))
    assert get_n_redn_dim(e) == 1
    assert not is_any_redn_dim_parametric(e)
    e2 = f.einsum("ej,ej->j", f.array("u", ("E", 35)), f.array("v", ("E", 35)))
    assert is_any_redn_dim_parametric(e2)
