"""TPU probe: can bf16_3x dots make fold-8 pay off for DG div/grad?

Hypothesis (CLAUDE.md): div/grad are HBM-bound; fold-8 streams 691 vs 600
GB/s but was rejected because HIGHEST 6-pass dots + per-sublane extraction
no longer hide under DMA.  bf16_3x halves the MXU work and passes the 2e-5
f32 oracle -> fold+3x should reach the fold streaming ceiling.
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


def run(label, e, tr, validate=False):
    t0 = time.time()
    try:
        if validate:
            f.validate_batched_einsum_transform(e, tr, long_dim_length=2000)
        p = tr(f.generate_program(e))
        arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_in_graph(fn, arrays)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), E).values())
        gb = get_footprint_gbytes(e, long_dim_length=E)
        print(f"{label}: {gops/dt:7.0f} GOp/s | {gb/dt:5.0f} GB/s eff |"
              f" {dt*1e6:6.0f} us | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        m = re.search(r"(Scoped allocation[^.]*\.|Ran out of memory[^.]*\.)",
                      str(ex))
        print(f"{label}: FAIL", m.group(0) if m else str(ex)[:160],
              flush=True)


def sched(block, fold, prec):
    def tr(p):
        desc = {}
        if prec != "default":
            desc["precision"] = prec
        return fused_pallas_program(
            p, block_long=block, hoist=True, parallel_grid=True,
            dofmajor=True, fold=fold, **desc)
    return tr


div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, ndof, ndof), "float32"),
      f.array(un, ("E", ndof), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))

for name, e in [("div", div), ("grad", grad)]:
    # validate bf16_3x once per einsum
    run(f"{name} VAL  f0 3x b8192", e, sched(8192, False, "bf16_3x"),
        validate=True)
    run(f"{name} VAL  f8 3x b8192", e, sched(8192, True, "bf16_3x"),
        validate=True)
    for block in (8192, 16384, 32768):
        for fold in (False, True):
            for prec in ("default", "bf16_3x"):
                tag = f"{name} b{block:5d} f{8 if fold else 0} {prec:8s}"
                run(tag, e, sched(block, fold, prec))
print("ALLDONE", flush=True)
