"""Seed the archive with TCCG tensor-contraction facts (tc_xla_v0 +
ttgt_v0), mirroring the reference archive's cogent/ttgt coverage.

Usage: python scripts/tune_tccg.py [secs-per-bench] [bench-ids...]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import logging

import feinsum_tpu as f
from feinsum_tpu import sql_utils
from feinsum_tpu.tuning import autotune

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s: %(message)s")

# a representative spread of the 48 TCCG benchmarks: small/large K, matricized
# tensor products, transpose-heavy cases
DEFAULT_IDS = (1, 5, 12, 19, 25, 31, 38, 44)

# tc_gemm_v0 seeds: the measured winners from scripts/tpu_tc2_probe.py
# (fused-2D storage; Pallas streaming kernel @ bf16_3x b10, XLA dot @
# highest), both operand orientations
_GEMM_SEEDS = []
# best-first (points cost ~60 s each on the remote compiler; short budgets
# should still capture the winners): XLA dot @ native bf16_3x algorithm won
# tccg_35 (237 us = 98% of the write ceiling), pallas b10 @ 3x close behind
for swap in (False, True):
    _GEMM_SEEDS.append({
        "log2_block": 10, "blkc128": 0, "backend_pallas": False,
        "precision_idx": 1, "swap": swap, "dofmajor": False,
        "fold": False, "vmem_idx": 2})
    _GEMM_SEEDS.append({
        "log2_block": 10, "blkc128": 0, "backend_pallas": True,
        "precision_idx": 1, "swap": swap, "dofmajor": True,
        "fold": False, "vmem_idx": 2})
for swap in (False, True):
    _GEMM_SEEDS.append({
        "log2_block": 10, "blkc128": 0, "backend_pallas": False,
        "precision_idx": 0, "swap": swap, "dofmajor": False,
        "fold": False, "vmem_idx": 2})
    for lb, fold in ((10, True), (11, False)):
        _GEMM_SEEDS.append({
            "log2_block": lb, "blkc128": 0, "backend_pallas": True,
            "precision_idx": 1, "swap": swap, "dofmajor": True,
            "fold": fold, "vmem_idx": 2})

import os

IMPLS = tuple((os.environ.get("TCCG_IMPLS")
               or "tc_gemm_v0,tc_xla_v0,ttgt_v1").split(","))

if __name__ == "__main__":
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    ids = ([int(a) for a in sys.argv[2:]] if len(sys.argv) > 2
           else DEFAULT_IDS)
    for bench_id in ids:
        einsum = f.get_tccg_benchmark(bench_id, dtype="float32")
        print(f"=== TCCG #{bench_id}: {einsum.get_subscripts()}"
              f" {einsum.arg_to_shape} ===", flush=True)
        for impl in IMPLS:
            t0 = time.time()
            try:
                autotune(einsum, impl, db_path=sql_utils.DEFAULT_DB,
                         long_dim_length=100, stop_after=budget,
                         seed_configs=(_GEMM_SEEDS
                                       if impl == "tc_gemm_v0" else None),
                         skip_value_mismatch=True)
            except Exception as ex:  # noqa: BLE001
                print(f"  {impl} error: {str(ex)[:200]}", flush=True)
            print(f"  {impl}: {time.time()-t0:.0f}s", flush=True)
    print("TCCG TUNING COMPLETE", flush=True)
