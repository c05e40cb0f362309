"""Device-lane probe: the jfold (outer-product-first) schedule for div/grad
— one wide MXU dot per row instead of per-s dots — plus precision floors
and vmem variants for div."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, get_giga_op_map,
                                 evaluate_giga_op_map, get_roofline_flop_rate)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000
ndof = 35


def run(label, e, tr):
    t0 = time.time()
    try:
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), E).values())
        roof = get_roofline_flop_rate(e, "TPU v5 lite", long_dim_length=E)
        frac = 100.0 * gops / (dt * roof)
        print(f"{label}: {dt*1e6:6.0f} us | {frac:5.1f}% roofline"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {str(ex)[:160]}", flush=True)


def sched(block, **kw):
    def tr(p):
        return fused_pallas_program(
            p, block_long=block, dofmajor=True,
            **{"hoist": True, "parallel_grid": True, **kw})
    return tr


div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(un, ("E", ndof), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))

for blk in (8192, 16384):
    run(f"div jfold      b{blk}", div, sched(blk, jfold=True))
    run(f"div jfold pb   b{blk}", div, sched(blk, jfold=True, preblock=True))
    run(f"div jfold pb3x b{blk}", div,
        sched(blk, jfold=True, preblock=True, precision_3x=True))
run("div jfold+fold+pb3x b16384", div,
    sched(16384, jfold=True, fold=True, preblock=True, precision_3x=True))
run("div fastest    b8192", div, sched(8192, precision="fastest"))
run("div 3x pb      b8192", div, sched(8192, preblock=True,
                                       precision_3x=True))
run("div pb v48M    b8192", div, sched(8192, preblock=True,
                                       vmem_limit_bytes=48 * 2**20))
run("div pb v64M    b8192", div, sched(8192, preblock=True,
                                       vmem_limit_bytes=64 * 2**20))
for blk in (8192, 16384):
    run(f"grad jfold pb3x b{blk}", grad,
        sched(blk, jfold=True, preblock=True, precision_3x=True))
run("grad jfold+fold pb3x b16384", grad,
    sched(16384, jfold=True, fold=True, preblock=True, precision_3x=True))
run("grad champ fold pb3x b4096", grad,
    sched(4096, fold=True, preblock=True, precision_3x=True))
print("ALLDONE", flush=True)
