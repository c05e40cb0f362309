"""Targeted lane_pack sweep for the matvec/vecmat classes (VERDICT r2 next
#3): record specific (g, block) points into the archive rather than random
search — the candidate set is small and structured.  One short process per
invocation (relay ops guidance, CLAUDE.md): pass a class name.

Usage: python scripts/tune_lane_pack.py [matvec|vecmat] [seconds-budget]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402

E_TUNE = 1_000_000


def record(e, params, label):
    t0 = time.time()
    try:
        sql_utils.record_facts(
            e, transform_id="mass_v0.py", transform_params=params,
            runtime_in_sec=None, db_path=sql_utils.DEFAULT_DB,
            long_dim_length=E_TUNE,
            timeit_kwargs={"validation_long_dim_length": 2048})
        qs = sql_utils.query(e, db_path=sql_utils.DEFAULT_DB)
        mine = [q for q in qs if dict(q.transform_params).get("lane_pack_g")
                == params.get("lane_pack_g")]
        rate = max((q.total_giga_op_rate for q in mine), default=0.0)
        print(f"{label}: {rate:.0f} GOp/s ({time.time() - t0:.0f}s)",
              flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label}: FAIL {type(ex).__name__}: {str(ex)[:160]}",
              flush=True)


def base(log2_block, blkc128=0, **kw):
    p = {"log2_block": log2_block, "blkc128": blkc128, "dofmajor": True,
         "fold": False, "preblock": False, "precision_3x": False,
         "hoist": False, "jfold": False, "mfold": False, "prereduce": False,
         "parallel_grid": True, "vmem_idx": 2, "split_rows": False,
         "accum_f32": False, "host_hoist": True}
    p.update(kw)
    return p


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "matvec"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0
    t0 = time.time()

    def blocks_for(gd):
        # VMEM viability (matches guard_vmem's ~15 KB/element at gd=640):
        # ~24 * blk * gd bytes of double-buffered blocks; stay under 80 MB
        cap = (80 << 20) // (24 * gd)
        out = []
        for lb, bc in ((13, 0), (14, 0), (0, 4), (0, 8), (0, 6),
                       (15, 0), (12, 0), (11, 0)):
            blk = 1024 * bc if bc else 2 ** lb
            if blk <= cap:
                out.append((lb, bc))
        return out[:4]

    if which == "matvec":
        d = 20
        e = f.einsum("ej,ij->ei", f.array("u", ("E", d), "float32"),
                     f.array("D", (d, d), "float32"))
        vs = (3, 4, 5, 2)            # g = 2^v; g*d: 160..640, 80
    elif which == "vecmat":
        d = 35
        e = f.einsum("ej,j->e", f.array("A", ("E", d), "float32"),
                     f.array("x", (d,), "float32"))
        vs = (3, 4, 5)               # g%8==0 needs v>=3 (out dim = g)
    else:
        raise SystemExit(f"unknown class {which}")
    pts = []
    for v in vs:
        for dm in (True, False):
            for lb, bc in blocks_for((2 ** v) * d):
                pts.append((f"{which} g=2^{v} dm={dm} b{lb}/c{bc}",
                            base(lb or 8, bc, lane_pack_g=v, dofmajor=dm)))
    for label, params in pts:
        if time.time() - t0 > budget:
            print("budget exhausted", flush=True)
            break
        record(e, params, label)
    print("LANE_PACK SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
