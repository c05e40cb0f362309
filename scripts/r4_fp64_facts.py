"""Record one chunked-XLA fp64 fact for the face-mass class (and any other
fp64 DG class still without facts) so bench's fp64-everywhere section can
replay a PROVEN champion instead of gambling a fresh f64-emulation compile
mid-run (those sicken the helper pool for every row after them — live
bench 2026-08-19 14:50 lost the grad row that way).

MUST run dead-last in any TPU window: the f64 compile poisons the helper
pool for subsequent fresh compiles in ANY process.

Usage: python scripts/r4_fp64_facts.py [deadline-epoch]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402

E_TUNE = 1_000_000
# div's swept fp64 optimum (CLAUDE.md r2: chunk=2^10 +60% over unchunked)
PARAMS = {"use_opt_path": False, "precision_idx": 0, "log2_chunk": 10}


def classes():
    ndof = 35
    yield "face64", f.einsum(
        "ifj,fe,fej->ei",
        f.array("L", (ndof, 4, 15), "float64"),
        f.array("Fj", (4, "E"), "float64"),
        f.array("flux", (4, "E", 15), "float64"))
    yield "mass64", f.einsum(
        "e,ij,ej->ei",
        f.array("jac", ("E",), "float64"),
        f.array("M", (ndof, ndof), "float64"),
        f.array("u", ("E", ndof), "float64"))


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 1e18
    for name, e64 in classes():
        if time.time() + 240 > deadline:
            print("deadline: stopping", flush=True)
            return
        have = [q for q in sql_utils.query(e64, err_if_no_results=False)
                if any(k == "log2_chunk"
                       for k, _v in (q.transform_params or ()))]
        if have:
            print(f"{name}: chunked fact already archived — skipping",
                  flush=True)
            continue
        ts = time.time()
        try:
            sql_utils.record_facts(
                e64, transform_id="xla_v0.py", transform_params=PARAMS,
                runtime_in_sec=None, db_path=sql_utils.DEFAULT_DB,
                long_dim_length=E_TUNE,
                timeit_kwargs={"validation_long_dim_length": 2000})
            qs = sql_utils.query(e64, err_if_no_results=False)
            best = max((q.total_giga_op_rate for q in qs), default=0.0)
            print(f"{name}: recorded ({time.time()-ts:.0f}s), best"
                  f" {best:.1f} GOp/s", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAIL {type(ex).__name__}: {str(ex)[:400]}",
                  flush=True)
    print("FP64 FACTS DONE", flush=True)


if __name__ == "__main__":
    main()
