"""Probe: mfold (resident M-packing) on grad — 3 r-dots of M=35 per plane
become one M=120 dot (3x fewer MXU tile passes).  Measured against the 941
us champion; also matvec blocks beyond the old 2^16 space cap."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, get_footprint_gbytes)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000
ndof = 35

grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
matvec = f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                  f.array("D", (20, 20), "float32"))


def run(label, e, block, validate=False, **kw):
    t0 = time.time()
    try:
        def tr(p):
            return fused_pallas_program(
                p, block_long=block, parallel_grid=kw.pop("parallel", True),
                hoist=kw.pop("hoist", True), dofmajor=True,
                fold=kw.pop("fold", True), preblock=kw.pop("preblock", True),
                precision_3x=True, **kw)
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


run("grad mfold b4096 [VAL]", grad, 4096, validate=True, mfold=True)
run("grad mfold blkc640", grad, 8 * 640, mfold=True)
run("grad mfold b8192", grad, 8192, mfold=True)
run("grad mfold blkc1536", grad, 8 * 1536, mfold=True)
run("grad mfold b4096 vmem128", grad, 4096, mfold=True, vmem_idx=2)
# matvec beyond the old space cap (b15 champ 247us; trend said bigger=better)
run("matvec fold 3x blkc4096=b15", matvec, 8 * 4096, preblock=False,
    hoist=False)
run("matvec fold 3x blkc8192=b16", matvec, 8 * 8192, preblock=False,
    hoist=False)
run("matvec fold 3x blkc16384=b17", matvec, 8 * 16384, preblock=False,
    hoist=False)
run("matvec fold 3x blkc32768=b18", matvec, 8 * 32768, preblock=False,
    hoist=False)
run("matvec b16 vmem128", matvec, 8 * 8192, preblock=False, hoist=False,
    vmem_idx=2)
print("ALLDONE", flush=True)
