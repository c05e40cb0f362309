"""Probe: close the last few percent on grad (941 us champion = ~76-77% of
the 728 us bandwidth floor) and matvec (79%).  Levers: non-power-of-2 fold
blocks (the tuner's log2 grid is coarse: b12=4096 -> blk_c 512, b13 -> 1024,
nothing between), the 128 MB Mosaic VMEM cap, grid semantics, and jfold."""
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


def run(label, e, block, **kw):
    t0 = time.time()
    try:
        p = fused_pallas_program(
            f.generate_program(e), block_long=block,
            parallel_grid=kw.pop("parallel", True),
            hoist=kw.pop("hoist", True), dofmajor=True,
            fold=kw.pop("fold", True), preblock=kw.pop("preblock", True),
            precision_3x=True, **kw)
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:150]}",
              flush=True)


# champion reproduction + fine block sweep (fold blk_c multiples of 128)
run("grad fold pb3x b4096 (champ)", grad, 4096)
for blk_c in (384, 640, 768, 896):
    run(f"grad fold pb3x blkc{blk_c}", grad, 8 * blk_c)
# VMEM cap 128M at the champion and at b13
run("grad b4096 vmem128", grad, 4096, vmem_idx=2)
run("grad b8192 vmem128", grad, 8192, vmem_idx=2)
# arbitrary semantics (Mosaic scheduling freedom A/B)
run("grad b4096 arbitrary", grad, 4096, parallel=False)
# jfold at fine blocks
run("grad jfold b4096", grad, 4096, jfold=True)
run("grad jfold blkc640", grad, 8 * 640, jfold=True)

# matvec: champion fold+3x (no preblock qualifies)
run("matvec fold 3x b8192 (champ?)", matvec, 8192, preblock=False,
    hoist=False)
for blk_c in (640, 768, 1536, 2048):
    run(f"matvec fold 3x blkc{blk_c}", matvec, 8 * blk_c, preblock=False,
        hoist=False)
run("matvec b8192 vmem128", matvec, 8192, preblock=False, hoist=False,
    vmem_idx=2)
print("ALLDONE", flush=True)
