"""Probe: fine-block (blkc128) + vmem polish pass over the remaining
headline rows — face (603us/80.1%), mass (80.0%), copy (85.1%), div35
champion neighborhood.  The blkc128 optima on grad sat between the log2
points; check the same for these."""
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

face = f.einsum("ifj,fe,fej->ei",
                f.array("L", (ndof, 4, 15), "float32"),
                f.array("Fj", (4, "E"), "float32"),
                f.array("flux", (4, "E", 15), "float32"))
mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
copy2 = f.einsum("ij,ij->ij", f.array("A", ("E", ndof), "float32"),
                 f.array("B", ("E", ndof), "float32"))
div = f.batched_einsum(
    "es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(un, ("E", ndof), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
matvec = f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                  f.array("D", (20, 20), "float32"))


def run(label, e, block, **kw):
    t0 = time.time()
    try:
        p = fused_pallas_program(
            f.generate_program(e), block_long=block,
            parallel_grid=kw.pop("parallel", True),
            hoist=kw.pop("hoist", True), dofmajor=True,
            fold=kw.pop("fold", True), preblock=kw.pop("preblock", True),
            precision_3x=kw.pop("p3x", True), **kw)
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:150]}",
              flush=True)


# face: champion jfold+fold+pb+3x (which block? try fine sweep)
for blk_c in (1024, 1536, 2048, 2560):
    run(f"face jfold blkc{blk_c}", face, 8 * blk_c, jfold=True, vmem_idx=2)
# mass: champion fold+pb+3x; fine sweep
for blk_c in (2048, 3072, 4096):
    run(f"mass blkc{blk_c}", mass, 8 * blk_c, hoist=False, vmem_idx=2)
# copy: fold only
for blk_c in (2048, 4096, 6144):
    run(f"copy blkc{blk_c}", copy2, 8 * blk_c, hoist=False, p3x=False,
        preblock=False, vmem_idx=2)
# div35: champion jfold b13; neighborhood
for blk_c in (1280, 1536):
    run(f"div35 jfold blkc{blk_c}", div, 8 * blk_c, jfold=True, vmem_idx=2)
# matvec: last tries
run("matvec arb b15", matvec, 32768, hoist=False, preblock=False,
    parallel=False, vmem_idx=2)
run("matvec vm64 b15", matvec, 32768, hoist=False, preblock=False,
    vmem_idx=0)
print("ALLDONE", flush=True)
