"""Probe: mfold on the div class (hoisted schedule step1 'sij,ej->sei' has
the same unrolled-resident-dot shape as grad) vs the jfold champion
(1311us); also div P1-P3 sizes with mfold."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, get_footprint_gbytes)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000


def make_div(ndof):
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array(un, ("E", ndof), "float32")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def run(label, e, block, validate=False, **kw):
    t0 = time.time()
    try:
        def tr(p):
            return fused_pallas_program(
                p, block_long=block, parallel_grid=kw.pop("parallel", True),
                hoist=kw.pop("hoist", True), dofmajor=True,
                fold=kw.pop("fold", True), preblock=kw.pop("preblock", True),
                precision_3x=kw.pop("p3x", True), **kw)
        if validate:
            f.validate_batched_einsum_transform(e, tr, long_dim_length=2048)
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:150]}",
              flush=True)


div = make_div(35)
run("div jfold b13 (champ)", div, 8192, jfold=True)
run("div mfold b13 [VAL]", div, 8192, mfold=True, validate=True)
run("div mfold blkc1536", div, 8 * 1536, mfold=True)
run("div mfold blkc2048 vm128", div, 8 * 2048, mfold=True, vmem_idx=2)
run("div mfold+jfold b13", div, 8192, mfold=True, jfold=True)
# P-levels with mfold
for ndof, blocks in [(20, (16384, 8 * 3072)), (10, (32768,)),
                     (4, (32768,))]:
    for b in blocks:
        run(f"div{ndof} mfold b{b}", make_div(ndof), b, mfold=True)
print("ALLDONE", flush=True)
