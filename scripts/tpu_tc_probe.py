"""Probe: the two answers to the expansion-heavy TCCG pathology (tccg_35 at
~5% of roofline, 3954us archived): ttgt natural_out (no output transpose)
and the multigrid tc_pallas kernel.  Uses concrete shapes; device-trace
timing; validates each candidate against numpy once."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 evaluate_giga_op_map, get_giga_op_map,
                                 _timeit_device_trace, get_footprint_gbytes)
from feinsum_tpu.tuning import get_transform_func_from_module_path

CASES = (35, 21, 43, 2)   # expansion-heavy + a couple of mid cases


def run(label, e, tr, validate=True):
    t0 = time.time()
    try:
        if validate:
            f.validate_batched_einsum_transform(e, tr, long_dim_length=100)
        p = tr(f.generate_program(e))
        lengths = {ix: int(ln) for ix, ln in e.index_to_dim_length.items()}
        arrays = _apply_layouts(p, generate_input_arrays(
            e, long_dim_length=100))
        fn = f.build_executable(p, index_to_length=lengths)
        dt = _timeit_device_trace(fn, arrays)
        gops = sum(evaluate_giga_op_map(get_giga_op_map(e), 100).values())
        gb = get_footprint_gbytes(e, long_dim_length=100)
        print(f"{label}: {gops/dt:8.0f} GOp/s | {gb/dt:6.0f} GB/s |"
              f" {dt*1e6:7.0f} us | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:140]}",
              flush=True)


ttgt = get_transform_func_from_module_path("ttgt_v0")
tcp = get_transform_func_from_module_path("tc_pallas_v0")

for idx in CASES:
    e = f.get_tccg_benchmark(idx, dtype="float32")
    rank = len(e.out_idx_set)
    val = idx == 35   # numpy oracle at full size is minutes for the GEMMs
    print(f"--- tccg_{idx:02d} {e.get_subscripts()}"
          f" {dict(e.index_to_dim_length)}", flush=True)
    run(f"tccg_{idx:02d} ttgt natural 3x",
        e, ttgt.bind_args(e, perm_a=0, perm_b=0, perm_out=0,
                          precision_idx=2, natural_out=1), validate=val)
    run(f"tccg_{idx:02d} ttgt natural default",
        e, ttgt.bind_args(e, perm_a=0, perm_b=0, perm_out=0,
                          precision_idx=0, natural_out=1), validate=False)
    if rank >= 3:
        for n_grid in (max(1, rank - 3), rank - 2):
            run(f"tccg_{idx:02d} tc_pallas g{n_grid} 3x",
                e, tcp.bind_args(e, n_grid=n_grid, precision_idx=1,
                                 use_opt_path=False), validate=val)
print("ALLDONE", flush=True)
