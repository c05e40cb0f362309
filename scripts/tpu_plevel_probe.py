"""Probe: push the P1-P3 DG rows with the round-2 tricks (mfold for grad,
jfold+preblock+3x for div, fine blocks) — archived champions predate them.
Floors (B/elt /819GB/s): grad20 435us, grad10 239us, div20 630us,
div10 337us, div4 161us."""
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


def make_grad(ndof):
    return f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                    f.array("D", (3, ndof, ndof), "float32"),
                    f.array("u", ("E", ndof), "float32"))


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


# grad P2/P3: mfold (the grad35/grad4 winner)
run("grad20 mfold b15", make_grad(20), 32768, mfold=True)
run("grad20 mfold blkc2560", make_grad(20), 8 * 2560, mfold=True,
    vmem_idx=2)
run("grad20 champ repro (b13 nofold no3x)", make_grad(20), 8192,
    fold=False, preblock=False, p3x=False)
run("grad10 mfold b15", make_grad(10), 32768, mfold=True)
run("grad10 mfold blkc5120", make_grad(10), 8 * 5120, mfold=True,
    vmem_idx=2)
# div P3/P2: the div35 champion recipe (jfold+fold+pb+3x)
run("div20 jfold b14", make_div(20), 16384, jfold=True)
run("div20 jfold blkc2560", make_div(20), 8 * 2560, jfold=True, vmem_idx=2)
run("div20 champ repro (b15 no3x nopb)", make_div(20), 32768,
    preblock=False, p3x=False)
run("div10 jfold b15", make_div(10), 32768, jfold=True)
run("div10 jfold blkc5120", make_div(10), 8 * 5120, jfold=True, vmem_idx=2)
run("div4 jfold b15", make_div(4), 32768, jfold=True)
run("div4 jfold blkc8192", make_div(4), 8 * 8192, jfold=True, vmem_idx=2)
print("ALLDONE", flush=True)
