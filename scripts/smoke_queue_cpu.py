"""CPU smoke of the TPU work queue's tune scripts (run before a round's
relay window opens): exercises every class's space construction + seed
projection, drives each script's __main__ enumeration with record stubs
(scratch DB or fake runtime), and measures one real point per searchable
space — so a Python-level bug can never burn a TPU window.

What it does NOT cover: Mosaic compilability and real performance (the
known TPU-only failure classes).  dd/tc kernels' numerics are covered by
tests/; this drives the exact call shapes the TPU sweep will make.

Usage: python scripts/smoke_queue_cpu.py   (CPU-only; ~4 min single-core)
"""
import os
import sys
import tempfile
import types

import jax

jax.config.update("jax_platforms", "cpu")

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.tuning import (  # noqa: E402
    autotune,
    get_transform_func_from_module_path,
)

SCRATCH = os.path.join(tempfile.mkdtemp(), "smoke.sqlite")
HOST_TIMEIT = {"method": "host", "min_rounds": 2, "min_seconds": 0.01}


def load(path, name="smoke_import"):
    g = {"__name__": name, "__file__": path}
    exec(compile(open(path).read(), path, "exec"), g)
    return g


def smoke_small_ndof():
    m = load("scripts/tune_small_ndof.py")
    for which, (einsum, impl) in m["CLASSES"].items():
        space = get_transform_func_from_module_path(impl).get_param_space(
            f.canonicalize_einsum(einsum))
        seed = {"log2_block": 10, "blkc128": 0, "dofmajor": True,
                "fold": True, "preblock": False, "precision_3x": False,
                "hoist": False, "jfold": False, "mfold": False,
                "prereduce": False, "lane_pack_g": 0, "rowcat": False,
                "parallel_grid": True, "vmem_idx": 2, "split_rows": False,
                "accum_f32": False, "host_hoist": True}
        p = m["project_seed"](space, seed)
        assert set(p) == set(space), (which, set(space) ^ set(p))
        print(f"small_ndof {which}: space {len(space)} knobs, seed OK",
              flush=True)
    einsum, impl = m["CLASSES"]["div4"]
    autotune(einsum, impl, db_path=SCRATCH, test_limit=1,
             long_dim_length=2048, timeit_kwargs=HOST_TIMEIT)
    print("small_ndof div4: 1 measured point OK", flush=True)


def smoke_lane_pack():
    g = load("scripts/tune_lane_pack.py")
    calls = []

    def record(e, params, label):
        calls.append(label)
        try:
            sql_utils.record_facts(
                e, transform_id="mass_v0.py", transform_params=params,
                runtime_in_sec=None, db_path=SCRATCH, long_dim_length=4096,
                timeit_kwargs=dict(HOST_TIMEIT,
                                   validation_long_dim_length=2048))
            print(f"  {label}: OK", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"  {label}: {type(ex).__name__}: {str(ex)[:120]}",
                  flush=True)

    g["record"] = record
    for cls in ("matvec", "vecmat"):
        sys.argv = ["tune_lane_pack.py", cls, "600"]
        g["main"]()
    print(f"lane_pack: {len(calls)} points driven", flush=True)


def smoke_enumeration_only():
    # dd / tc_pallas: fake-runtime record (interpret-mode pallas at real
    # sizes is the known exponential-CPU-compile trap; numerics are in
    # tests/) — this still catches arg typos and enumeration errors
    for path, argvs in [("scripts/tune_dd.py",
                         [["x", "div", "60"], ["x", "grad", "60"]]),
                        ("scripts/tune_tc_pallas.py", [["x", "60"]])]:
        g = load(path)
        n = [0]
        g["sql_utils"] = types.SimpleNamespace(
            DEFAULT_DB=SCRATCH,
            record_facts=lambda e, **kw: (
                n.__setitem__(0, n[0] + 1),
                kw["transform_id"], kw["transform_params"]),
            query=lambda *a, **kw: [])
        for argv in argvs:
            sys.argv = argv
            try:
                g["main"]()
            except SystemExit:
                pass
        print(f"{path}: {n[0]} record calls OK", flush=True)


def smoke_ttgt_v1():
    g = load("scripts/tune_ttgt_v1.py")
    e = f.get_tccg_benchmark(12, dtype="float32")
    # on CPU the shipped archive's TPU-keyed facts are invisible: 0 seeds
    # is expected; on TPU the same call decodes the v0 champions
    seeds = g["v0_champion_seeds"](e)
    print(f"ttgt_v1: {len(seeds)} v0-champion seeds decode", flush=True)
    autotune(e, "ttgt_v1", db_path=SCRATCH, test_limit=1,
             seed_configs=seeds, timeit_kwargs=HOST_TIMEIT)
    print("ttgt_v1: 1 measured point OK", flush=True)


if __name__ == "__main__":
    smoke_small_ndof()
    smoke_lane_pack()
    smoke_enumeration_only()
    smoke_ttgt_v1()
    print("QUEUE SMOKE OK")
