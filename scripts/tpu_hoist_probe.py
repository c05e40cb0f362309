"""Probe: host-hoisted resident steps (hoist_resident_steps) on the curl
class.  Hypothesis: curl + prereduce('rij->ij') with the reduction hoisted
to XLA turns the kernel into exactly mass3's shape, closing the ~36%
curl-vs-mass3 gap (1746 vs 1281 us) that in-kernel prereduce could not
(Mosaic computed-resident dot trap: 9.6 ms)."""
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


def run(label, e, tr, validate=False):
    t0 = time.time()
    try:
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
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:160]}",
              flush=True)


def sched(block, fold=False, preblock=False, jfold=False, p3x=False,
          hoist=True, prereduce=False, host=True):
    def tr(p):
        prog = fused_pallas_program(
            p, block_long=block, hoist=hoist, parallel_grid=True,
            dofmajor=True, fold=fold, preblock=preblock, jfold=jfold,
            precision_3x=p3x, prereduce=prereduce)
        return prog.with_descriptor(hoist_resident_steps=host)
    return tr


curl = f.batched_einsum(
    "e,rij,ej->ei",
    [[f.array(j, ("E",), "float32"),
      f.array("D", (3, ndof, ndof), "float32"),
      f.array(u, ("E", ndof), "float32")]
     for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])
mass3 = f.batched_einsum(
    "e,ij,ej->ei",
    [[f.array(j, ("E",), "float32"),
      f.array("M", (ndof, ndof), "float32"),
      f.array(u, ("E", ndof), "float32")]
     for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])

# numerics check once on-device (hoisted prereduce path)
run("curl prered+host fold pb3x b13 [VAL]", curl,
    sched(8192, fold=True, preblock=True, p3x=True, hoist=False,
          prereduce=True), validate=True)
# block sweep on the hoisted prereduce curl
run("curl prered+host fold pb3x b12", curl,
    sched(4096, fold=True, preblock=True, p3x=True, hoist=False,
          prereduce=True))
run("curl prered+host fold pb3x b14", curl,
    sched(16384, fold=True, preblock=True, p3x=True, hoist=False,
          prereduce=True))
# A/B: same schedule with in-kernel resident steps (the old trap)
run("curl prered-inkernel fold pb3x b13", curl,
    sched(8192, fold=True, preblock=True, p3x=True, hoist=False,
          prereduce=True, host=False))
# reference points
run("mass3 fold pb3x b13", mass3,
    sched(8192, fold=True, preblock=True, p3x=True, hoist=False))
# old curl champion (plain single-step + preblock + 3x UNFOLDED b?)
run("curl plain pb3x unfolded b14", curl,
    sched(16384, preblock=True, p3x=True, hoist=False))
print("ALLDONE", flush=True)
