"""curl round 2: single-step (trivial) schedule vs jfold — mass3 with the
same traffic runs 1281us while curl-jfold takes 2902us."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu import sql_utils
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, get_footprint_gbytes)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000
ndof = 35

curl = f.batched_einsum(
    "e,rij,ej->ei",
    [[f.array(j, ("E",), "float32"),
      f.array("D", (3, ndof, ndof), "float32"),
      f.array(u, ("E", ndof), "float32")]
     for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])


def run(label, params):
    t0 = time.time()
    try:
        tr = lambda p: fused_pallas_program(
            p, block_long=2 ** params.pop("log2_block"), **params)
        p = tr(f.generate_program(curl))
        arrays = _apply_layouts(p, generate_input_arrays(
            curl, long_dim_length=E))
        fn = f.build_executable(p, long_dim_length=E)
        dt = _timeit_device_trace(fn, arrays)
        gb = get_footprint_gbytes(curl, long_dim_length=E)
        print(f"{label}: {gb/dt:5.0f} GB/s eff | {dt*1e6:6.0f} us"
              f" | wall {time.time()-t0:.0f}s", flush=True)
        return dt
    except Exception as ex:
        print(f"{label}: FAIL {str(ex)[:160]}", flush=True)
        return None


base = dict(hoist=False, parallel_grid=True, dofmajor=True)
results = {}
results["trivial fold pb3x b13"] = (
    dict(base, log2_block=13, fold=True, preblock=True, precision_3x=True))
results["trivial fold pb3x b14"] = (
    dict(base, log2_block=14, fold=True, preblock=True, precision_3x=True))
results["trivial pb3x b13"] = (
    dict(base, log2_block=13, preblock=True, precision_3x=True))
results["trivial fold pb b14"] = (
    dict(base, log2_block=14, fold=True, preblock=True))
best = (None, 1e9)
for label, params in results.items():
    dt = run(f"curl {label}", dict(params))
    if dt and dt < best[1]:
        best = (params, dt)
print("best:", best[1] * 1e6, "us", flush=True)
# record the best honest point into the shipped archive
if best[0] is not None and best[1] < 2.9e-3:
    params = dict(best[0])
    params["log2_block"] = params.pop("log2_block")
    rec = {"log2_block": params["log2_block"], "hoist": False,
           "parallel_grid": True, "dofmajor": True,
           "fold": params.get("fold", False),
           "preblock": params.get("preblock", False),
           "precision_3x": params.get("precision_3x", False),
           "jfold": False}
    sql_utils.record_facts(curl, transform_id="curl_3d_v0.py",
                           transform_params=rec, runtime_in_sec=None,
                           db_path=sql_utils.DEFAULT_DB,
                           long_dim_length=E)
    print("recorded", rec, flush=True)
print("ALLDONE", flush=True)
