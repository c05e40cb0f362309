"""Score tc_pallas_v0 (the multigrid COGENT-analog kernel) on the TCCG
sample by ENUMERATION — its guarded space leaves only 0-8 valid points per
benchmark (tccg_12 rank-2 and tccg_21 VMEM-bound leave zero), so random
autotune wastes the relay window.  VERDICT r2 #4a: record wins or retire
the space with evidence.

Usage: python scripts/tune_tc_pallas.py [secs-budget] [ids...]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.tuning import (  # noqa: E402
    get_transform_func_from_module_path,
)

IDS = (2, 5, 12, 21, 35, 43)


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 1500.0
    ids = [int(a) for a in sys.argv[2:]] or list(IDS)
    sp = get_transform_func_from_module_path("tc_pallas_v0")
    t0 = time.time()
    for idx in ids:
        e = f.get_tccg_benchmark(idx, dtype="float32")
        try:
            space = sp.get_param_space(e)
        except Exception as ex:  # noqa: BLE001
            print(f"tccg_{idx:02d}: space rejected"
                  f" ({type(ex).__name__}: {str(ex)[:120]})", flush=True)
            continue
        n_valid = 0
        for ng in range(space["n_grid"].low, space["n_grid"].high + 1):
            for pi in (0, 1):
                for op in (False, True):
                    if time.time() - t0 > budget:
                        print("budget exhausted", flush=True)
                        return
                    params = {"n_grid": ng, "precision_idx": pi,
                              "use_opt_path": op}
                    try:
                        tr = sp.bind_args(e, **params)
                        tr(f.generate_program(e))   # guard check, cheap
                    except Exception:  # noqa: BLE001
                        continue
                    n_valid += 1
                    ts = time.time()
                    try:
                        sql_utils.record_facts(
                            e, transform_id="tc_pallas_v0.py",
                            transform_params=params, runtime_in_sec=None,
                            db_path=sql_utils.DEFAULT_DB,
                            long_dim_length=100)
                        print(f"tccg_{idx:02d} {params}: recorded"
                              f" ({time.time() - ts:.0f}s)", flush=True)
                    except Exception as ex:  # noqa: BLE001
                        print(f"tccg_{idx:02d} {params}: FAIL"
                              f" {type(ex).__name__}: {str(ex)[:140]}",
                              flush=True)
        print(f"tccg_{idx:02d}: {n_valid} valid points", flush=True)
    print("TC_PALLAS SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
