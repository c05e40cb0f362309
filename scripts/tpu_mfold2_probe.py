"""Probe: mfold block extension (trend still rising at blkc1536=890us),
matvec micro-sweep around its b15 optimum, and grad@ndof=4 candidates for
the missing P1 archive fact."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, get_footprint_gbytes)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000


def make_grad(ndof):
    return f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                    f.array("D", (3, ndof, ndof), "float32"),
                    f.array("u", ("E", ndof), "float32"))


grad = make_grad(35)
grad4 = make_grad(4)
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


for blk_c in (1792, 2048, 2560, 3072):
    run(f"grad mfold blkc{blk_c} vm128", grad, 8 * blk_c, mfold=True,
        vmem_idx=2)
# grad@ndof4: P1 candidates (u 16B/elt, out 48B, J 36B -> tiny dofs)
run("grad4 fold pb3x b14 [VAL]", grad4, 16384, validate=True)
run("grad4 fold pb3x b15", grad4, 32768, )
run("grad4 fold pb3x b16", grad4, 65536)
run("grad4 fold pb3x mfold b15", grad4, 32768, mfold=True)
run("grad4 fold pb b15 (no3x)", grad4, 32768, p3x=False)
# matvec micro-sweep around blkc4096
run("matvec fold 3x blkc3072", matvec, 8 * 3072, preblock=False, hoist=False)
run("matvec fold 3x blkc5120", matvec, 8 * 5120, preblock=False, hoist=False)
run("matvec fold 3x blkc4608", matvec, 8 * 4608, preblock=False, hoist=False)
print("ALLDONE", flush=True)
