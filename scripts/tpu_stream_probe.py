"""Honest (device-lane) streaming map: bus efficiency vs stream count,
layout mode, R:W mix — plus XLA-backend comparisons for the suite shapes.
Bus efficiency = (padded bytes moved) / dt / 819 GB/s."""
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


def run(label, e, tr):
    t0 = time.time()
    try:
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        if dt is None:
            dt = _timeit_in_graph(fn, arrays)
            srcm = "ig"
        else:
            srcm = "dev"
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us ({srcm})"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {str(ex)[:160]}", flush=True)


def pall(block=16384, fold=False, flatten=False, par=True, hoist=False,
         **kw):
    def tr(p):
        if flatten:
            return p.with_descriptor(backend="pallas", block_long=block,
                                     dimension_semantics="parallel",
                                     flatten=True)
        return fused_pallas_program(p, block_long=block, hoist=hoist,
                                    parallel_grid=par, dofmajor=True,
                                    fold=fold, **kw)
    return tr


def xla(hoist=True, dofmajor=False):
    def tr(p):
        prog = (f.generate_program_with_opt_einsum_schedule(p.einsum)
                if hoist else p)
        desc = {}
        if dofmajor:
            from feinsum_tpu.ops.layouts import dofmajor_layouts
            layouts, out_perm = dofmajor_layouts(p.einsum)
            desc = {"arg_layouts": layouts, "out_layout": out_perm}
        return prog.with_descriptor(backend="xla", **desc)
    return tr


A = f.array("A", ("E", ndof), "float32")
B = f.array("B", ("E", ndof), "float32")
C = f.array("C", ("E", ndof), "float32")
Dd = f.array("Dd", ("E", ndof), "float32")

copy2 = f.einsum("ij,ij->ij", A, B)
one_one = f.einsum("j,ej->ej", f.array("x", (ndof,), "float32"), A)
w_heavy = f.batched_einsum("ij->ij", [[A], [A]])
balanced = f.batched_einsum("ij->ij", [[A], [B]])
four_r = f.batched_einsum("ij,ij->ij", [[A, B], [C, Dd]])

# streaming structure map
run("copy3  flat      ", copy2, pall(flatten=True))
run("copy3  unfold    ", copy2, pall())
run("copy3  fold b32k ", copy2, pall(block=32768, fold=True, par=False))
run("1R1W   unfold    ", one_one, pall())
run("1R1W   fold b32k ", one_one, pall(block=32768, fold=True, par=False))
run("1R2W   flat      ", w_heavy, pall(flatten=True))
run("2R2W   flat      ", balanced, pall(flatten=True))
run("4R2W   flat      ", four_r, pall(flatten=True))
run("1R2W   fold b32k ", w_heavy, pall(block=32768, fold=True, par=False))
run("2R2W   fold b32k ", balanced, pall(block=32768, fold=True, par=False))

# XLA backend vs our pallas (suite shapes)
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
run("copy3  XLA plain ", copy2, xla(hoist=False))
run("copy3  XLA dofmaj", copy2, xla(hoist=False, dofmajor=True))
run("div    XLA plain ", div, xla())
run("div    XLA dofmaj", div, xla(dofmajor=True))
run("grad   XLA dofmaj", grad, xla(dofmajor=True))
run("mass   XLA dofmaj", mass, xla(dofmajor=True))
print("ALLDONE", flush=True)
