"""TPU probe: (1) Kronecker fold path — u folded (j,8,c) viewed (8j, c)
[free sublane merge], one dot with M (x) I_8 per block, no per-plane
slicing; (2) 2-stream unfolded copy; (3) profiler trace on gstream vs copy.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_in_graph, get_footprint_gbytes)
from feinsum_tpu.ops.kernel_lowering import _dot_bf16_3x

E = 1_000_000
F = 8


def kron_matvec(ndof, blk_c, prec, jac=False):
    """out[(i,f),c] = sum_j (M kron I8)[(i,f),(j,f)] u[(j,f),c]
    (optionally * jac[(f),c]); returns (fn, arrays, bytes_per_elt)."""
    c_len = E // F
    rng = np.random.default_rng(0)
    u = np.asarray(rng.random((ndof, F, c_len)), np.float32)
    M = np.asarray(rng.random((ndof, ndof)), np.float32)
    Mk = np.kron(M, np.eye(F, dtype=np.float32))          # (8n, 8n)
    arrays = {"u": jax.device_put(u), "Mk": jax.device_put(Mk)}
    nbytes = 2 * ndof * 4 + (4 if jac else 0)
    if jac:
        j_ = np.asarray(rng.random((F, c_len)), np.float32)
        arrays["jac"] = jax.device_put(j_)

    n8 = ndof * F
    grid = (pl.cdiv(c_len, blk_c),)

    def kernel(*refs):
        if jac:
            u_ref, mk_ref, j_ref, o_ref = refs
        else:
            u_ref, mk_ref, o_ref = refs
        ub = u_ref[...].reshape(n8, blk_c)       # free: sublane merge
        mk = mk_ref[...]
        if prec == "3x":
            core = _dot_bf16_3x(mk, ub, (((1,), (0,)), ((), ())), jax, jnp)
        else:
            core = jax.lax.dot_general(
                mk, ub, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        core = core.reshape(ndof, F, blk_c)
        if jac:
            core = core * j_ref[...][None, :, :]
        o_ref[...] = core

    spec_u = pl.BlockSpec((ndof, F, blk_c), lambda g: (0, 0, g))
    spec_m = pl.BlockSpec((n8, n8), lambda g: (0, 0))
    in_specs = [spec_u, spec_m]
    if jac:
        in_specs.append(pl.BlockSpec((F, blk_c), lambda g: (0, g)))
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((ndof, F, blk_c), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((ndof, F, c_len), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2**20))

    order = ["u", "Mk"] + (["jac"] if jac else [])

    def fn(arrs):
        return (call(*[arrs[k] for k in order]),)

    # validate once at small scale vs numpy
    smallc = 512
    su = u[:, :, :smallc]
    ref = np.einsum("ij,jfc->ifc", M.astype(np.float64),
                    su.astype(np.float64))
    if jac:
        ref = ref * arrays and ref  # jac validation handled below
    got = None
    sj = None
    s_arrays = {"u": jax.device_put(su), "Mk": arrays["Mk"]}
    if jac:
        sj = np.asarray(arrays["jac"])[:, :smallc]
        s_arrays["jac"] = jax.device_put(sj)
        ref = ref * sj[None, :, :]
    small_grid = (pl.cdiv(smallc, smallc),)
    s_call = pl.pallas_call(
        kernel, grid=small_grid,
        in_specs=[pl.BlockSpec((ndof, F, smallc), lambda g: (0, 0, g)),
                  spec_m] + ([pl.BlockSpec((F, smallc), lambda g: (0, g))]
                             if jac else []),
        out_specs=pl.BlockSpec((ndof, F, smallc), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((ndof, F, smallc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)))
    blk_c_saved = blk_c
    # rebuild kernel closure bound to smallc? kernel uses blk_c from closure:
    # instead just run the big call on padded arrays -- skip: validate via
    # big call on the real arrays' first elements
    got = np.asarray(fn(arrays)[0])[:, :, :smallc]
    ref_full = np.einsum("ij,jfc->ifc", M.astype(np.float64),
                         u[:, :, :smallc].astype(np.float64))
    if jac:
        ref_full = ref_full * np.asarray(arrays["jac"])[None, :, :smallc]
    err = np.max(np.abs(got - ref_full)) / (np.abs(ref_full).max() or 1)
    return fn, arrays, nbytes, err


def run_kron(label, ndof, blk_c, prec, jac=False):
    t0 = time.time()
    try:
        fn, arrays, nbytes, err = kron_matvec(ndof, blk_c, prec, jac)
        dt = _timeit_in_graph(fn, arrays)
        gb = nbytes * E / 1e9
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us |"
              f" relerr {err:.2e} | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {str(ex)[:160]}", flush=True)


run_kron("kron mvec20 3x  blk4096", 20, 4096, "3x")
run_kron("kron mvec20 HI  blk4096", 20, 4096, "hi")
run_kron("kron mvec20 3x  blk8192", 20, 8192, "3x")
run_kron("kron mass35 3x  blk4096", 35, 4096, "3x", jac=True)
run_kron("kron mass35 HI  blk4096", 35, 4096, "hi", jac=True)

# --- 2-stream unfolded copy: x (j,) resident, u (j,E) -> out (j,E) ---
from feinsum_tpu.tuning.impls._common import fused_pallas_program
from feinsum_tpu.measure import (get_giga_op_map, evaluate_giga_op_map)
two = f.einsum("j,ej->ej", f.array("x", (35,), "float32"),
               f.array("u", ("E", 35), "float32"))
try:
    p = fused_pallas_program(f.generate_program(two), block_long=16384,
                             hoist=False, dofmajor=True)
    arrays = _apply_layouts(p, generate_input_arrays(two, long_dim_length=E))
    fn = f.build_executable(p, long_dim_length=E)
    dt = _timeit_in_graph(fn, arrays)
    gb = get_footprint_gbytes(two, long_dim_length=E)
    print(f"2stream copy b16384: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us",
          flush=True)
except Exception as ex:
    print(f"2stream copy: FAIL {str(ex)[:200]}", flush=True)

# --- profiler trace on gstream ---
gstream = f.einsum("xre,ei->xei", f.array("J", (3, 3, "E"), "float32"),
                   f.array("u", ("E", 35), "float32"))
try:
    from feinsum_tpu.measure import profile_program
    p = fused_pallas_program(f.generate_program(gstream), block_long=8192,
                             hoist=False, dofmajor=True)
    d = profile_program(p, long_dim_length=E, trace_dir="/tmp/gstream_trace",
                        n_iters=30)
    print("profiler trace:", d, flush=True)
except Exception as ex:
    print(f"profiler: FAIL {str(ex)[:200]}", flush=True)
print("ALLDONE", flush=True)
