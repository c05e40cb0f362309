"""TPU probe: (a) read:write streaming mix behavior, (b) preblock gains.

Observed: div streams at the padded-traffic ceiling (~690 GB/s padded) but
grad/bgrad sit at ~450 padded despite less compute and traffic.  grad's mix
is write-heavy (padded R:W = 256:480).  Map the wall vs R:W ratio with pure
elementwise kernels, then measure preblock (tile-exact small args).
"""
import time
import re
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 get_giga_op_map, evaluate_giga_op_map,
                                 get_footprint_gbytes, _timeit_in_graph)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000
ndof = 35


def run(label, e, tr):
    t0 = time.time()
    try:
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_in_graph(fn, arrays)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), E).values())
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gops/dt:8.1f} GOp/s | {gb/dt:5.0f} GB/s eff |"
              f" {dt*1e6:6.0f} us | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        m = re.search(r"(Scoped allocation[^.]*\.|Ran out of memory[^.]*\.)",
                      str(ex))
        print(f"{label}: FAIL", m.group(0) if m else str(ex)[:160],
              flush=True)


def flat(p):
    return p.with_descriptor(backend="pallas", block_long=8192,
                             dimension_semantics="parallel", flatten=True)


A = f.array("A", ("E", ndof), "float32")
B = f.array("B", ("E", ndof), "float32")
C = f.array("C", ("E", ndof), "float32")
Dd = f.array("Dd", ("E", ndof), "float32")

# R:W 1:2 — one input copied to two outputs
w_heavy = f.batched_einsum("ij->ij", [[A], [A]])
# R:W 1:1 — two independent copies
balanced = f.batched_einsum("ij->ij", [[A], [B]])
# R:W 2:1 — the classic copy (known ~697 total)
r_heavy = f.einsum("ij,ij->ij", A, B)
# R:W 4:1 — four-input product
r_vheavy = f.batched_einsum("ij,ij->ij", [[A, B], [C, Dd]])

run("w_heavy  R140:W280 flat", w_heavy, flat)
run("balanced R280:W280 flat", balanced, flat)
run("r_heavy  R280:W140 flat", r_heavy, flat)
run("r_vheavy R560:W280 flat", r_vheavy, flat)


def sched(block, fold=False, preblock=False, prec="default", hoist=True):
    def tr(p):
        desc = {}
        if prec != "default":
            desc["precision"] = prec
        return fused_pallas_program(
            p, block_long=block, hoist=hoist, parallel_grid=True,
            dofmajor=True, fold=fold, preblock=preblock, **desc)
    return tr


div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(un, ("E", ndof), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
face = f.einsum("ifj,fe,fej->ei",
                f.array("L", (ndof, 4, 15), "float32"),
                f.array("Fj", (4, "E"), "float32"),
                f.array("flux", (4, "E", 15), "float32"))

run("div  pb   b8192", div, sched(8192, preblock=True))
run("div  pb   b16384", div, sched(16384, preblock=True))
run("grad pb   b8192", grad, sched(8192, preblock=True))
run("grad pb   b16384", grad, sched(16384, preblock=True))
run("grad pb+fold b16384", grad, sched(16384, fold=True, preblock=True))
run("mass pb   b16384", mass, sched(16384, preblock=True, hoist=False))
run("mass fold b32768", mass, sched(32768, fold=True, hoist=False))
run("mass plain b16384", mass, sched(16384, hoist=False))
run("face pb   b16384", face, sched(16384, preblock=True))
run("face fold b32768", face, sched(32768, fold=True))
print("ALLDONE", flush=True)
