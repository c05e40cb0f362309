"""TPU probe: is the skinny-dot MXU cost (HIGHEST = 6 bf16 passes over a
35x35 matrix) the wall for mass/matvec/grad?  precision={default,bf16_3x,
fastest} splits DMA-bound from MXU-bound ('fastest' fails the oracle; used
here only as a speed floor).  Plus a compute-free grad-shaped streamer."""
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


def sched(block, fold=False, preblock=False, prec="default", hoist=False,
          vmem=None):
    def tr(p):
        desc = {}
        if prec != "default":
            desc["precision"] = prec
        if vmem:
            desc["vmem_limit_bytes"] = vmem
        return fused_pallas_program(
            p, block_long=block, hoist=hoist, parallel_grid=True,
            dofmajor=True, fold=fold, preblock=preblock, **desc)
    return tr


mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
matvec = f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                  f.array("D", (20, 20), "float32"))
grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))
# grad-shaped streamer: same in/out traffic shape, VPU-only compute
gstream = f.einsum("xre,ei->xei", f.array("J", (3, 3, "E"), "float32"),
                   f.array("u", ("E", ndof), "float32"))

for prec in ("default", "bf16_3x", "fastest"):
    run(f"mass fold b32768 {prec:8s}", mass,
        sched(32768, fold=True, prec=prec))
for prec in ("bf16_3x", "fastest"):
    run(f"mass plainb16384 {prec:8s}", mass, sched(16384, prec=prec))
for prec in ("default", "bf16_3x", "fastest"):
    run(f"mvec fold b32768 {prec:8s}", matvec,
        sched(32768, fold=True, prec=prec))
run("grad fast b8192", grad, sched(8192, hoist=True, prec="fastest"))
run("gstream   b8192", gstream, sched(8192))
run("gstream   b16384", gstream, sched(16384))
run("grad v32M b8192", grad, sched(8192, hoist=True, vmem=32 * 2**20))
run("grad v48M b8192", grad, sched(8192, hoist=True, vmem=48 * 2**20))
run("grad v64M b16384", grad, sched(16384, hoist=True, vmem=64 * 2**20))
run("grad v64M+pb b8192", grad,
    sched(8192, hoist=True, preblock=True, vmem=64 * 2**20))
print("ALLDONE", flush=True)
