"""Double-double (f32-pair) fp64 kernels (ops/dd_emitter.py; VERDICT r2
next #7): mass/matvec/div-family f64 einsums computed entirely in
error-free-transformation f32 arithmetic, validated at the f64 oracle's
1e-12 north star."""

import numpy as np
import pytest

import feinsum_tpu as f
from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.ops.dd_emitter import dd_add, dd_mul, split_to_pairs
from feinsum_tpu.tuning import get_transform_func_from_module_path


def make_div(ndof, dtype="float64"):
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(j, ("E", 3), dtype),
          f.array("R", (3, ndof, ndof), dtype),
          f.array(u, ("E", ndof), dtype)]
         for j, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def test_dd_arithmetic_exceeds_f32():
    rng = np.random.default_rng(0)
    x = rng.random(1024)
    y = rng.random(1024)
    xp, yp = split_to_pairs(x), split_to_pairs(y)
    ph, pl_ = dd_mul(xp[0], xp[1], yp[0], yp[1])
    prod = np.asarray(ph, np.float64) + np.asarray(pl_, np.float64)
    assert np.max(np.abs(prod - x * y) / np.abs(x * y)) < 1e-13
    sh, sl = dd_add(xp[0], xp[1], yp[0], yp[1])
    s = np.asarray(sh, np.float64) + np.asarray(sl, np.float64)
    assert np.max(np.abs(s - (x + y)) / np.abs(x + y)) < 1e-14


@pytest.mark.parametrize("subs,arrays", [
    ("ej,ij->ei", [("u", ("E", 20)), ("D", (20, 20))]),
    ("e,ij,ej->ei", [("jac", ("E",)), ("M", (20, 20)), ("u", ("E", 20))]),
])
def test_dd_families_validate_at_1em12(subs, arrays):
    e = f.einsum(subs, *[f.array(n, s, "float64") for n, s in arrays])
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    tr = sp.bind_args(e, log2_block=10, parallel_grid=True)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=1000)


def test_dd_div_batched_and_partial_tail_block():
    e = make_div(7)
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    tr = sp.bind_args(e, log2_block=9, parallel_grid=True)
    # 1000 % 512 != 0: the cdiv grid's masked tail block must stay exact
    f.validate_batched_einsum_transform(e, tr, long_dim_length=1000)


def test_dd_rejects_f32_and_foreign_shapes():
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    e32 = f.einsum("ej,ij->ei", f.array("u", ("E", 8), "float32"),
                   f.array("D", (8, 8), "float32"))
    with pytest.raises(InvalidParameterError, match="fp64"):
        sp.bind_args(e32, log2_block=10)(f.generate_program(e32))
    # two residents: outside the family (face itself is supported now)
    two_res = f.einsum("ej,ik,kj->ei",
                       f.array("u", ("E", 6), "float64"),
                       f.array("A", (8, 5), "float64"),
                       f.array("B", (5, 6), "float64"))
    with pytest.raises(InvalidParameterError):
        sp.bind_args(two_res, log2_block=10)(f.generate_program(two_res))


@pytest.mark.parametrize("subs,arrays", [
    # grad: extra static output axis carried by the streamed factor
    ("xre,rij,ej->xei", [("J", (3, 3, "E")), ("D", (3, 9, 9)),
                         ("u", ("E", 9))]),
    # face_mass: the streamed dof operand itself carries the s axis
    ("ifj,fe,fej->ei", [("L", (9, 4, 6)), ("Fj", (4, "E")),
                        ("flux", (4, "E", 6))]),
])
def test_dd_grad_and_face_families_validate_at_1em12(subs, arrays):
    """r3: the dd kernel covers the FULL reference DG fp64 family —
    out[x?,e,i] = sum_s F[x?,s?,e] * sum_j R[s?,i,j] * u[s?,e,j]."""
    e = f.einsum(subs, *[f.array(n, s, "float64") for n, s in arrays])
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    tr = sp.bind_args(e, log2_block=10, parallel_grid=True)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=1000)


def test_dd_curl_family_validates_at_1em12():
    """curl-style rows: the resident's extra axis is summed inside the
    kernel (no streamed partner for s)."""
    e = f.batched_einsum(
        "e,rij,ej->ei",
        [[f.array(j, ("E",), "float64"),
          f.array("D", (3, 9, 9), "float64"),
          f.array(u, ("E", 9), "float64")]
         for j, u in [("Jy", "uz"), ("Jz", "ux")]])
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    tr = sp.bind_args(e, log2_block=10, parallel_grid=True)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=1000)


def test_dd_grad_multistep_grid_and_tail():
    """Regression (r3): reusing the j-dot values across grad's x outputs
    miscompiled under the interpret path at grid >= 2 (scattered 1-2-ulp
    hi errors vs a strict-IEEE replica); the kernel now recomputes per x.
    Also pins the masked partial tail of the 4D (2,d_x,d_i,block) output
    (1000 % 512 != 0)."""
    e = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float64"),
                 f.array("D", (3, 4, 4), "float64"),
                 f.array("u", ("E", 4), "float64"))
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    tr = sp.bind_args(e, log2_block=9, parallel_grid=True)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=1000)


def _pallas_calls_of(jaxpr, found=None):
    found = [] if found is None else found
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            found.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _pallas_calls_of(v.jaxpr, found)
            elif hasattr(v, "eqns"):
                _pallas_calls_of(v, found)
    return found


def test_dd_index_maps_trace_i32_under_x64():
    """Under jax_enable_x64 (always on for the dd f64 oracle path) literal
    ints in a Pallas index map trace as i64, and the relay's Mosaic build
    rejects the whole module with "failed to legalize operation
    'func.return'" on the mapping function's (i64, i64, i32) return —
    root-caused by the 2026-08-20 solo dd diagnostic (the r4 "relay
    rejects every dd module" mystery, VERDICT r4 next #4).  Every emitted
    index map must therefore return i32 (layouts.index_map_i32)."""
    import jax

    from feinsum_tpu.codegen.program import build_executable, \
        generate_program
    from feinsum_tpu.measure import _apply_layouts, \
        ensure_x64_if_needed, generate_input_arrays

    e = f.einsum("es,sij,ej->ei", f.array("J", ("E", 3), "float64"),
                 f.array("R", (3, 9, 9), "float64"),
                 f.array("u", ("E", 9), "float64"))
    ensure_x64_if_needed(e)
    prog = generate_program(e)
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    prog = sp.bind_args(e, log2_block=10, parallel_grid=True)(prog)
    L = 1 << 10
    arrays = generate_input_arrays(e, long_dim_length=L, seed=0,
                                   as_numpy=True)
    dev = _apply_layouts(prog, arrays)
    fn = build_executable(prog, long_dim_length=L)
    calls = _pallas_calls_of(jax.make_jaxpr(fn)(dev).jaxpr)
    assert calls, "no pallas_call traced — dd kernel path changed?"
    for c in calls:
        for bm in c.params["grid_mapping"].block_mappings:
            dts = [str(v.aval.dtype)
                   for v in bm.index_map_jaxpr.jaxpr.outvars]
            assert all(d == "int32" for d in dts), (
                f"index map traced non-i32 outputs {dts} — this relay's"
                " Mosaic rejects i64 func.return (dd diag 2026-08-20)")
