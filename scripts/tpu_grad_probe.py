"""Isolate grad's streaming loss: 3D blocks (J (3,3,blk), out (3,35,blk))
vs the equivalent batched 2D form; hoist on/off; vmem; semantics."""
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
        print(f"{label}: {gops/dt:7.0f} GOp/s | {gb/dt:5.0f} GB/s eff |"
              f" {dt*1e6:6.0f} us | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        m = re.search(r"(Scoped allocation[^.]*\.|Ran out of memory[^.]*\.)",
                      str(ex))
        print(f"{label}: FAIL", m.group(0) if m else str(ex)[:160],
              flush=True)


grad = f.einsum("xre,rij,ej->xei", f.array("J", (3, 3, "E"), "float32"),
                f.array("D", (3, ndof, ndof), "float32"),
                f.array("u", ("E", ndof), "float32"))

# equivalent batched form: 3 rows, all blocks 2D (out rows (i,e))
bgrad = f.batched_einsum(
    "re,rij,ej->ei",
    [[f.array(jn, (3, "E"), "float32"),
      f.array("D", (3, ndof, ndof), "float32"),
      f.array("u", ("E", ndof), "float32")]
     for jn in ("Jx", "Jy", "Jz")])


def sched(block, hoist=True, par=True, vmem=None, **kw):
    def tr(p):
        desc = dict(kw)
        if vmem:
            desc["vmem_limit_bytes"] = vmem
        return fused_pallas_program(
            p, block_long=block, hoist=hoist, parallel_grid=par,
            dofmajor=True, **desc)
    return tr


run("grad  base b8192 hoist", grad, sched(8192))
run("bgrad 2d    b8192 hoist", bgrad, sched(8192))
run("bgrad 2d    b16384 hoist", bgrad, sched(16384))
run("grad  base b8192 nohoist", grad, sched(8192, hoist=False))
run("grad  base b8192 arb", grad, sched(8192, par=False))
run("grad  base b8192 vmem64M", grad, sched(8192, vmem=64 * 2**20))
run("grad  base b4096 hoist", grad, sched(4096))
run("grad  3x    b8192 hoist", grad, sched(8192, precision="bf16_3x"))
print("ALLDONE", flush=True)
