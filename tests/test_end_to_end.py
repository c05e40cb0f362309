"""The full product loop, end to end on CPU: trace a user's JAX function,
match it, look up the archive, replay the transform, execute, validate —
the reference's transform-knowledge-transfer test (test_loopy_utils.py:
145-173) in TPU-native form."""

import doctest

import jax.numpy as jnp
import numpy as np

import feinsum_tpu as f
from feinsum_tpu import sql_utils
from feinsum_tpu.matching import get_a_matched_einsum


def test_trace_match_retrieve_replay(tmp_path):
    db = str(tmp_path / "archive.sqlite")

    # 1. someone tuned the canonical DG divergence and recorded a fact
    ndof = 8
    tuned = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array("Jx", ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array("ux", ("E", ndof), "float32")]])
    sql_utils.record_facts(
        tuned, transform_id="dg_div_v0.py",
        transform_params={"log2_block": 8, "hoist": True,
                          "parallel_grid": True, "dofmajor": True},
        runtime_in_sec=1e-4, device="TPU v5 lite", db_path=db,
        long_dim_length=1000)

    # 2. a user writes their own differently-named computation
    def user_div(jac, ref_mat, dofs):
        return jnp.einsum("ns,sab,nb->na", jac, ref_mat, dofs)

    E = 640
    args = [jnp.ones((E, 3), jnp.float32),
            jnp.ones((3, ndof, ndof), jnp.float32),
            jnp.ones((E, ndof), jnp.float32)]
    matched, _ = get_a_matched_einsum(user_div, args)

    # 3. archive hit via canonical form, despite all-new names
    transform = sql_utils.retrieve(matched, "TPU v5 lite", db_path=db)

    # 4. replay onto the user's program and validate numerically
    f.validate_batched_einsum_transform(matched, transform,
                                        long_dim_length=E)
    program = transform(f.generate_program(matched))
    assert program.descriptor.backend == "pallas"
    assert program.descriptor.block_long == 256
    assert program.descriptor.arg_layouts  # dofmajor applied

    fn = f.build_executable(program, long_dim_length=E)
    from feinsum_tpu.measure import _apply_layouts
    arrays = _apply_layouts(program, {"jac": np.ones((E, 3), np.float32),
                                      "ref_mat": np.ones((3, ndof, ndof),
                                                         np.float32),
                                      "dofs": np.ones((E, ndof),
                                                      np.float32)})
    (out,) = fn(arrays)
    # out delivered in the descriptor's stored layout (dof-major)
    assert out.shape == (ndof, E)
    np.testing.assert_allclose(np.asarray(out), 3.0 * ndof, rtol=1e-5)


def test_doctests():
    import feinsum_tpu.utils as utils_mod
    failures, _ = doctest.testmod(utils_mod).failed, None
    assert not failures


def test_multigrid_tc_kernel():
    """The first-party TC path (descriptor.grid_index as a tuple of output
    letters): each grid cell computes one output slice in place — the
    COGENT-analog kernel for expansion-heavy contractions where XLA's
    output transpose is the bottleneck (TCCG #35 at ~5% of roofline)."""
    from feinsum_tpu.diagnostics import InvalidParameterError
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    e = f.einsum("dfgb,geac->abcdef",
                 f.array("A", (6, 4, 5, 7), "float32"),
                 f.array("B", (5, 8, 9, 10), "float32"))
    sp = get_transform_func_from_module_path("tc_pallas_v0")
    tr = sp.bind_args(e, n_grid=3, precision_idx=0, use_opt_path=False)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=100)
    prog = tr(f.generate_program(e))
    assert prog.descriptor.grid_index == ("a", "b", "c")

    # rank-2 GEMMs and over-unrolled points are guarded, not miscompiled
    import pytest

    gemm = f.einsum("ik,kj->ij", f.array("A", (64, 64), "float32"),
                    f.array("B", (64, 64), "float32"))
    with pytest.raises(InvalidParameterError):
        sp.bind_args(gemm, n_grid=1, precision_idx=0, use_opt_path=False)(
            f.generate_program(gemm))


def test_tc_gemm_v0_fused2d():
    """tc_gemm_v0: dense TC rewritten to a GEMM-natural fused-2D program
    (descriptor.pre_layouts storage contract) — both the XLA-dot route and
    the first-party Pallas streaming route validate against numpy on the
    original high-rank einsum."""
    from feinsum_tpu.diagnostics import InvalidParameterError
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    e = f.einsum("dfgb,geac->abcdef",
                 f.array("A", (6, 4, 5, 7), "float32"),
                 f.array("B", (5, 8, 9, 10), "float32"))
    sp = get_transform_func_from_module_path("tc_gemm_v0")
    for backend_pallas, swap, dofmajor in (
            (False, False, False), (False, True, False),
            (True, False, True), (True, True, False)):
        tr = sp.bind_args(e, log2_block=8, blkc128=0,
                          backend_pallas=backend_pallas, precision_idx=0,
                          swap=swap, dofmajor=dofmajor, fold=False,
                          vmem_idx=2)
        f.validate_batched_einsum_transform(e, tr, long_dim_length=100)
    prog = sp.bind_args(e, log2_block=8, blkc128=0, backend_pallas=False,
                        precision_idx=0, swap=False, dofmajor=False,
                        fold=False, vmem_idx=2)(f.generate_program(e))
    # swap is canonical-relative (this einsum's canonical operand order is
    # (B, A), sigma_j=(1,0)): swap=False makes B(geac) the streamed lhs —
    # M=(e,a,c)->positions (1,2,3), K=(g,)->(0,) — and A the resident rhs
    # with K position (2,)
    assert dict(prog.descriptor.pre_layouts)["B"] == ((1, 2, 3), (0,))
    assert dict(prog.descriptor.pre_layouts)["A"][1] == (2,)
    assert prog.descriptor.bind_lengths == (("e", 8 * 9 * 10),)

    # batch-index (shared free axis) contractions are guarded
    import pytest

    be = f.einsum("abk,akc->abc", f.array("A", (4, 5, 6), "float32"),
                  f.array("B", (4, 6, 7), "float32"))
    with pytest.raises(InvalidParameterError):
        sp.bind_args(be, log2_block=8, blkc128=0, backend_pallas=False,
                     precision_idx=0, swap=False, dofmajor=False,
                     fold=False, vmem_idx=2)(f.generate_program(be))


def test_multigrid_tc_blocks_legal_for_mosaic():
    """Every K-promotion-era tc_pallas point 500'd live (2026-08-19): a
    gridded letter among an operand's last-two stored dims gives the block
    a trailing 1 — illegal under Mosaic's last-two-dims rule.  The
    transform must store gridded letters LEADING (arg_layouts), and the
    real (non-interpret) TPU lowering must succeed — checked host-side by
    AOT cross-lowering, no TPU needed."""
    from dataclasses import replace

    import jax

    from feinsum_tpu.codegen.program import build_executable
    from feinsum_tpu.measure import apply_layouts, generate_input_arrays
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    # tccg_02: dca,bd->abc — grid letter 'a' is operand 0's LAST axis
    e = f.get_tccg_benchmark(2, dtype="float32")
    sp = get_transform_func_from_module_path("tc_pallas_v0")
    tr = sp.bind_args(e, n_grid=1, precision_idx=0, use_opt_path=False)
    prog = tr(f.generate_program(e))
    layouts = prog.descriptor.arg_layouts_map
    name0 = e.args[0][0].name
    assert layouts[name0][0] == e.in_idx_sets[0].index("a")

    prog = replace(prog, descriptor=replace(prog.descriptor,
                                            interpret=False))
    fn = build_executable(prog, long_dim_length=100)
    arrays = apply_layouts(prog, generate_input_arrays(
        e, long_dim_length=100, seed=0))
    jax.jit(fn).trace(arrays).lower(lowering_platforms=("tpu",))


def test_tc_pallas_v1_mxu_row_axis():
    """tc_pallas_v1: per-grid-axis blocks + an explicit in-kernel MXU row
    letter (descriptor.grid_m) + M-stacking.  v0's cells covered one index
    per gridded axis and lowered every contraction to VPU broadcast-sums
    (no row axis -> no dot_general); v1 must validate numerically in every
    (m, mstack, block) combination on a TC with a gridded trailing operand
    axis (reference space: cogent.py:52-115 output-axis tiling)."""
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    e = f.einsum("dca,bd->abc", f.array("A", (6, 8, 4), "float32"),
                 f.array("B", (5, 6), "float32"))
    sp = get_transform_func_from_module_path("tc_pallas_v1")
    for m_pos, mstack, blk0_idx in ((2, False, 0), (2, True, 1),
                                    (1, False, 1), (2, True, 2)):
        tr = sp.bind_args(e, n_grid=1, blk0_idx=blk0_idx, blk1_idx=0,
                          m_pos=m_pos, mstack=mstack, precision_idx=0,
                          use_opt_path=False)
        f.validate_batched_einsum_transform(e, tr, long_dim_length=100)

    prog = sp.bind_args(e, n_grid=1, blk0_idx=1, blk1_idx=0, m_pos=2,
                        mstack=True, precision_idx=0,
                        use_opt_path=False)(f.generate_program(e))
    assert prog.descriptor.grid_m == "c"
    assert prog.descriptor.grid_blocks == (("a", 2),)
    # operand A (dca): grid letter a leads, M letter c second-to-last,
    # K letter d trailing
    assert prog.descriptor.arg_layouts_map["A"] == (2, 1, 0)


def test_tc_pallas_v1_mosaic_legal_on_tccg():
    """The v1 configs forecast for the TCCG sweep must cross-lower for the
    real Mosaic backend host-side (the r4 tool that root-caused the v0
    crash class without touching the relay)."""
    from dataclasses import replace

    import jax

    from feinsum_tpu.codegen.program import build_executable
    from feinsum_tpu.measure import apply_layouts, generate_input_arrays
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    sp = get_transform_func_from_module_path("tc_pallas_v1")
    # tccg_02 dca,bd->abc: grid a (block 8), M=c, lane b, mstack over a
    # tccg_05 ebad,ce->abcd: grid (a,b) (blocks 1,24), M=d, lane c,
    # mstack over b (gridding b keeps it off the auto-picked lane, which
    # must land on c so operand A carries only {M,K})
    for case, kwargs in (
            (2, dict(n_grid=1, blk0_idx=5, blk1_idx=0, m_pos=2,
                     mstack=True, precision_idx=1, use_opt_path=False)),
            (5, dict(n_grid=2, blk0_idx=0, blk1_idx=9, m_pos=3,
                     mstack=True, precision_idx=1, use_opt_path=False)),
    ):
        e = f.get_tccg_benchmark(case, dtype="float32")
        prog = sp.bind_args(e, **kwargs)(f.generate_program(e))
        prog = replace(prog, descriptor=replace(prog.descriptor,
                                                interpret=False))
        fn = build_executable(prog, long_dim_length=100)
        arrays = apply_layouts(prog, generate_input_arrays(
            e, long_dim_length=100, seed=0))
        jax.jit(fn).trace(arrays).lower(lowering_platforms=("tpu",))


def test_tc_pallas_v1_blocked_grid_m_letter():
    """grid_m may itself be a BLOCKED grid letter: it stays stored leading
    (rep_from_block keeps the row letter as an array dim regardless of
    position) and mstack's per-slice padding engages (elen=2 -> 8)."""
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    e = f.einsum("dma,bd->mab", f.array("A", (6, 4, 5), "float32"),
                 f.array("B", (8, 6), "float32"))
    sp = get_transform_func_from_module_path("tc_pallas_v1")
    for mstack in (False, True):
        tr = sp.bind_args(e, n_grid=1, blk0_idx=1, blk1_idx=0, m_pos=0,
                          mstack=mstack, precision_idx=0,
                          use_opt_path=False)
        f.validate_batched_einsum_transform(e, tr, long_dim_length=100)
    prog = tr(f.generate_program(e))
    assert prog.descriptor.grid_m == "m"
    assert prog.descriptor.grid_blocks == (("m", 2),)
    # A (d,m,a): gridded m leads, K=d trails
    assert prog.descriptor.arg_layouts_map["A"] == (1, 2, 0)
