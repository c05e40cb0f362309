"""Post-retune probe: (a) curl's 2.8x-floor gap — vs a 3-row batched mass
with identical traffic; (b) the rewritten in-graph fallback vs device lane;
(c) grad block variants."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, _timeit_in_graph,
                                 get_footprint_gbytes)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000
ndof = 35


def run(label, e, tr, also_ig=False):
    t0 = time.time()
    try:
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        gb = get_footprint_gbytes(e, long_dim_length=E)
        extra = ""
        if also_ig:
            ig = _timeit_in_graph(fn, arrays)
            extra = f" | ig {ig*1e6:6.0f} us"
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us{extra}"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {str(ex)[:160]}", flush=True)


def sched(block, fold=False, preblock=False, jfold=False, p3x=False,
          hoist=True):
    def tr(p):
        return fused_pallas_program(
            p, block_long=block, hoist=hoist, parallel_grid=True,
            dofmajor=True, fold=fold, preblock=preblock, jfold=jfold,
            precision_3x=p3x)
    return tr


curl = f.batched_einsum(
    "e,rij,ej->ei",
    [[f.array(j, ("E",), "float32"),
      f.array("D", (3, ndof, ndof), "float32"),
      f.array(u, ("E", ndof), "float32")]
     for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])
# identical traffic/compute shape, no r axis: 3 independent mass rows
mass3 = f.batched_einsum(
    "e,ij,ej->ei",
    [[f.array(j, ("E",), "float32"),
      f.array("M", (ndof, ndof), "float32"),
      f.array(u, ("E", ndof), "float32")]
     for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])
mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))

run("mass3 fold pb3x b14", mass3, sched(16384, fold=True, preblock=True,
                                        p3x=True, hoist=False))
run("mass3 fold pb3x b15", mass3, sched(32768, fold=True, preblock=True,
                                        p3x=True, hoist=False))
run("curl  jf fold pb3x b13", curl, sched(8192, fold=True, preblock=True,
                                          jfold=True, p3x=True))
run("curl  jf fold pb3x b15", curl, sched(32768, fold=True, preblock=True,
                                          jfold=True, p3x=True))
run("curl  jf pb3x b14", curl, sched(16384, preblock=True, jfold=True,
                                     p3x=True))
# in-graph fallback honesty check (old: 1029 vs 496 device)
run("mass plain b14 (ig check)", mass, sched(16384, hoist=False),
    also_ig=True)
# grad variants
run("grad fold pb3x b13", grad, sched(8192, fold=True, preblock=True,
                                      p3x=True))
run("grad fold pb3x b14", grad, sched(16384, fold=True, preblock=True,
                                      p3x=True))
print("ALLDONE", flush=True)
