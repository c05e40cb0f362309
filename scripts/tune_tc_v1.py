"""Seeded autotune of the tc_pallas_v1 space (blocked multi-axis grids +
in-kernel MXU row axis + M-stacking) on the TCCG sample classes — VERDICT
r4 next #6: give tccg_02/05 honest DMA-inclusive Pallas rows competitive
with the floor-saturating plain-HLO spans.

Forecasts (fill analysis, c78ac97): tccg_02 grid a blk 8-24, M=c, mstack
over a -> M-tile fill ~15% = the 151 us bandwidth floor (~9100 GOp/s);
tccg_05 grid (a,b), M=d, mstack over b -> ~10.5% fill (~5600-6200 GOp/s).

Usage: python scripts/tune_tc_v1.py [case] [secs]   (default: 2 600)
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu.tuning import autotune  # noqa: E402

import logging  # noqa: E402

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

SEEDS = {
    # out (a,b,c): M=c (m_pos 2); divisors(312)[5]=8, [7]=13, [8]=24
    2: [dict(n_grid=1, blk0_idx=5, blk1_idx=0, m_pos=2, mstack=True,
             precision_idx=1, use_opt_path=False),
        dict(n_grid=1, blk0_idx=8, blk1_idx=0, m_pos=2, mstack=True,
             precision_idx=1, use_opt_path=False),
        dict(n_grid=1, blk0_idx=5, blk1_idx=0, m_pos=2, mstack=False,
             precision_idx=1, use_opt_path=False)],
    # out (a,b,c,d): M=d (m_pos 3), grid (a,b) so the lane lands on c;
    # divisors(72)[9]=24, [6]=9
    5: [dict(n_grid=2, blk0_idx=0, blk1_idx=9, m_pos=3, mstack=True,
             precision_idx=1, use_opt_path=False),
        dict(n_grid=2, blk0_idx=0, blk1_idx=6, m_pos=3, mstack=True,
             precision_idx=1, use_opt_path=False),
        dict(n_grid=2, blk0_idx=2, blk1_idx=9, m_pos=3, mstack=True,
             precision_idx=1, use_opt_path=False)],
}

if __name__ == "__main__":
    case = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 600
    einsum = f.get_tccg_benchmark(case, dtype="float32")
    autotune(einsum, "tc_pallas_v1", stop_after=secs,
             long_dim_length=100, seed_configs=SEEDS.get(case))
