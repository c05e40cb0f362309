"""TPU perf sweep #1: DG kernels, xla vs pallas, block sizes."""
import time
import re
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 get_giga_op_map, evaluate_giga_op_map,
                                 get_footprint_gbytes, _timeit_in_graph)

E = 100_000
ndof = 35


def run(label, e, tr):
    t0 = time.time()
    p = tr(f.generate_program(e))
    arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
    try:
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_in_graph(fn, arrays, iters=30)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), E).values())
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gops/dt:7.0f} GOp/s | {gb/dt:5.0f} GB/s eff |"
              f" {dt*1e6:6.0f} us | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        m = re.search(r"(Scoped allocation[^.]*\.|Ran out of memory[^.]*\.)",
                      str(ex))
        print(f"{label}: FAIL", m.group(0) if m else str(ex)[:120], flush=True)


pal = lambda blk, **kw: (lambda p: f.generate_program_with_opt_einsum_schedule(
    p.einsum).with_descriptor(
        backend="pallas", block_long=blk, dimension_semantics="parallel",
        vmem_limit_bytes=100 * 1024 * 1024, **kw))
pal_triv = lambda blk, **kw: (lambda p: p.with_descriptor(
    backend="pallas", block_long=blk, dimension_semantics="parallel",
    vmem_limit_bytes=100 * 1024 * 1024, **kw))
xla_opt = lambda p: f.generate_program_with_opt_einsum_schedule(p.einsum)

matvec = f.einsum("ej,ij->ei", f.array("u", ("E", ndof), "float32"),
                  f.array("D", (ndof, ndof), "float32"))
copy2 = f.einsum("ij,ij->ij", f.array("A", ("E", ndof), "float32"),
                 f.array("B", ("E", ndof), "float32"))
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(n, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(u, ("E", ndof), "float32")]
     for n, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])

run("copy xla", copy2, lambda p: p)
run("copy pallas b4096", copy2, pal_triv(4096))
run("matvec xla", matvec, lambda p: p)
run("matvec pallas b512", matvec, pal_triv(512))
run("matvec pallas b4096", matvec, pal_triv(4096))
run("grad xla hoisted", grad, xla_opt)
run("grad pallas b512", grad, pal(512))
run("grad pallas b2048", grad, pal(2048))
run("grad pallas b8192", grad, pal(8192))
run("div xla hoisted", div, xla_opt)
run("div pallas b512", div, pal(512))
run("div pallas b2048", div, pal(2048))
print("DONE", flush=True)
