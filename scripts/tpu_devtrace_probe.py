"""Validate the device-trace timing protocol: suite kernels measured via
device trace AND in-graph, against the hard physical floor (real bytes /
819 GB/s).  A device-trace dt below the floor would mean the trace lies."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_in_graph, _timeit_device_trace,
                                 get_giga_op_map, evaluate_giga_op_map,
                                 get_footprint_gbytes, get_roofline_flop_rate)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000
ndof = 35


def run(label, e, tr):
    t0 = time.time()
    try:
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt_dev = _timeit_device_trace(fn, arrays)
        dt_ig = _timeit_in_graph(fn, arrays)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), E).values())
        gb = get_footprint_gbytes(e, long_dim_length=E)
        floor = gb / 819.0
        roof = get_roofline_flop_rate(e, "TPU v5 lite", long_dim_length=E)
        dd = dt_dev * 1e6 if dt_dev else float("nan")
        frac = 100.0 * gops / (dt_dev * roof) if dt_dev else float("nan")
        print(f"{label}: dev {dd:6.0f} us | ig {dt_ig*1e6:6.0f} us |"
              f" floor {floor*1e3*1e3:6.0f} us | {frac:5.1f}% roofline"
              f"{' *BELOW FLOOR*' if dt_dev and dt_dev < floor else ''}"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {str(ex)[:160]}", flush=True)


def sched(block, fold=False, preblock=False, hoist=True, par=True):
    def tr(p):
        return fused_pallas_program(
            p, block_long=block, hoist=hoist, parallel_grid=par,
            dofmajor=True, fold=fold, preblock=preblock)
    return tr


div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(un, ("E", ndof), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
face = f.einsum("ifj,fe,fej->ei",
                f.array("L", (ndof, 4, 15), "float32"),
                f.array("Fj", (4, "E"), "float32"),
                f.array("flux", (4, "E", 15), "float32"))
mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
matvec = f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                  f.array("D", (20, 20), "float32"))
copy2 = f.einsum("ij,ij->ij", f.array("A", ("E", ndof), "float32"),
                 f.array("B", ("E", ndof), "float32"))

run("div  base   b8192", div, sched(8192))
run("div  pb     b8192", div, sched(8192, preblock=True))
run("grad base   b8192", grad, sched(8192))
run("grad pb     b8192", grad, sched(8192, preblock=True))
run("grad fold   b16384", grad, sched(16384, fold=True))
run("face fold   b32768", face, sched(32768, fold=True))
run("face pb     b16384", face, sched(16384, preblock=True))
run("mass plain  b16384", mass, sched(16384, hoist=False))
run("mass pb     b16384", mass, sched(16384, hoist=False, preblock=True))
run("mass fold   b32768", mass, sched(32768, hoist=False, fold=True))
run("mvec plain  b16384", matvec, sched(16384, hoist=False))
run("mvec fold   b32768", matvec, sched(32768, hoist=False, fold=True))
run("copy fold   b32768", copy2, sched(32768, hoist=False, fold=True,
                                       par=False))
print("ALLDONE", flush=True)
