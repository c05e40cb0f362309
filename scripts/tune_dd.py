"""Sweep the double-double fp64 kernel (dd_pallas_v0) on the archive's f64
DG rows (VERDICT r2 next #7: one honest first-party attempt at fp64).
Safe for the compile helpers: the dd kernel is pure-f32 Mosaic — the
HTTP-500 poison came from XLA's giant f64-emulation modules, which this
route never compiles.

Usage: python scripts/tune_dd.py [div|mass|matvec|grad|face] [seconds-budget]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402

E_TUNE = 1_000_000


def make(which):
    if which == "div":
        return f.batched_einsum(
            "es,sij,ej->ei",
            [[f.array(j, ("E", 3), "float64"),
              f.array("R", (3, 35, 35), "float64"),
              f.array(u, ("E", 35), "float64")]
             for j, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
    if which == "mass":
        return f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float64"),
                        f.array("M", (35, 35), "float64"),
                        f.array("u", ("E", 35), "float64"))
    if which == "matvec":
        return f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float64"),
                        f.array("D", (20, 20), "float64"))
    if which == "grad":
        return f.einsum("xre,rij,ej->xei",
                        f.array("J", (3, 3, "E"), "float64"),
                        f.array("D", (3, 35, 35), "float64"),
                        f.array("u", ("E", 35), "float64"))
    if which == "face":
        return f.einsum("ifj,fe,fej->ei",
                        f.array("L", (35, 4, 15), "float64"),
                        f.array("Fj", (4, "E"), "float64"),
                        f.array("flux", (4, "E", 15), "float64"))
    if which == "curl":
        return f.batched_einsum(
            "e,rij,ej->ei",
            [[f.array(j, ("E",), "float64"),
              f.array("D", (3, 35, 35), "float64"),
              f.array(u, ("E", 35), "float64")]
             for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])
    raise SystemExit(f"unknown class {which}")


# VERDICT r3 missing #2 asks for measured fp64 rows for the FULL DG family;
# the queue only invokes div/grad, so leftover budget round-robins the rest.
BONUS = {"div": ("mass", "face"), "grad": ("curl", "matvec")}


def sweep(which, points, deadline):
    e = make(which)
    for lb, bc in points:
        if time.time() > deadline:
            print("budget exhausted", flush=True)
            return
        params = {"log2_block": lb or 8, "blkc128": bc,
                  "parallel_grid": True, "vmem_idx": 2}
        label = f"dd {which} b{lb}/c{bc}"
        ts = time.time()
        try:
            sql_utils.record_facts(
                e, transform_id="dd_pallas_v0.py", transform_params=params,
                runtime_in_sec=None, db_path=sql_utils.DEFAULT_DB,
                long_dim_length=E_TUNE,
                timeit_kwargs={"validation_long_dim_length": 2000})
            qs = [q for q in sql_utils.query(e, db_path=sql_utils.DEFAULT_DB)
                  if q.transform_id == "dd_pallas_v0.py"]
            rate = max((q.total_giga_op_rate for q in qs), default=0.0)
            print(f"{label}: best dd rate so far {rate:.1f} GOp/s"
                  f" ({time.time() - ts:.0f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{label}: FAIL {type(ex).__name__}: {str(ex)[:2000]}",
                  flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "div"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0
    deadline = time.time() + budget
    sweep(which, ((12, 0), (13, 0), (14, 0), (11, 0), (0, 4), (15, 0)),
          deadline)
    for bonus in BONUS.get(which, ()):
        if time.time() + 120 > deadline:
            break
        print(f"--- bonus family {bonus} (leftover budget) ---", flush=True)
        sweep(bonus, ((13, 0), (12, 0)), deadline)
    print("DD SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
