"""TPU sweep #2: DG suite through the emitter with layout schedules, E=1M."""
import time
import re
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 get_giga_op_map, evaluate_giga_op_map,
                                 get_footprint_gbytes, _timeit_in_graph)

E = 1_000_000
ndof = 35


def run(label, e, tr):
    t0 = time.time()
    p = tr(f.generate_program(e))
    arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
    try:
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_in_graph(fn, arrays)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), E).values())
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gops/dt:7.0f} GOp/s | {gb/dt:5.0f} GB/s eff |"
              f" {dt*1e6:6.0f} us | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        m = re.search(r"(Scoped allocation[^.]*\.|Ran out of memory[^.]*\.)",
                      str(ex))
        print(f"{label}: FAIL", m.group(0) if m else str(ex)[:130],
              flush=True)


def hoisted(p, **desc):
    return f.generate_program_with_opt_einsum_schedule(
        p.einsum).with_descriptor(backend="pallas",
                                  dimension_semantics="parallel", **desc)


# --- div (batched b=3): u/J/out transposed (dof-major) ---
div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(un, ("E", ndof), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
div_layout = tuple((n, (1, 0)) for n in
                   ("Jx", "Jy", "Jz", "ux", "uy", "uz"))
run("div plain  b4096", div, lambda p: hoisted(p, block_long=4096))
run("div dofmaj b8192", div,
    lambda p: hoisted(p, block_long=8192, arg_layouts=div_layout,
                      out_layout=(1, 0)))
run("div dofmaj b16384", div,
    lambda p: hoisted(p, block_long=16384, arg_layouts=div_layout,
                      out_layout=(1, 0)))

# --- grad: J already (3,3,E); transpose u; out (x,i,e) ---
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
run("grad plain  b4096", grad, lambda p: hoisted(p, block_long=4096))
run("grad dofmaj b8192", grad,
    lambda p: hoisted(p, block_long=8192, arg_layouts=(("u", (1, 0)),),
                      out_layout=(0, 2, 1)))

# --- face-mass: flux (4,E,15)->(4,15,E); out (i,e) ---
face = f.einsum("ifj,fe,fej->ei",
                f.array("L", (ndof, 4, 15), "float32"),
                f.array("Fj", (4, "E"), "float32"),
                f.array("flux", (4, "E", 15), "float32"))
run("face plain  b4096", face, lambda p: hoisted(p, block_long=4096))
run("face dofmaj b8192", face,
    lambda p: hoisted(p, block_long=8192,
                      arg_layouts=(("flux", (0, 2, 1)),),
                      out_layout=(1, 0)))

# --- matvec + copy ---
mv = f.einsum("ej,ij->ei", f.array("u", ("E", ndof), "float32"),
              f.array("D", (ndof, ndof), "float32"))
run("matvec dofmaj b16384", mv,
    lambda p: p.with_descriptor(backend="pallas", block_long=16384,
                                dimension_semantics="parallel",
                                arg_layouts=(("u", (1, 0)),),
                                out_layout=(1, 0)))
cp = f.einsum("ij,ij->ij", f.array("A", ("E", ndof), "float32"),
              f.array("B", ("E", ndof), "float32"))
run("copy flat b8192", cp,
    lambda p: p.with_descriptor(backend="pallas", block_long=8192,
                                dimension_semantics="parallel",
                                flatten=True))
print("ALLDONE", flush=True)
