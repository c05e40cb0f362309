"""CPU-only forecast of the driver bench from archived champion facts.

For every row the driver's ``bench.py`` measures, look up the archive
champion (the same ``sql_utils.query`` + rate ordering bench uses) and
divide its RECORDED GOp/s by the row's roofline — no TPU touch, safe to
run while a tuning process INSERTs.  Prints the predicted headline
geomean + vs_baseline and flags rows whose champion is PRE-PROTO3 (their
recorded rate may over-report; the reevaluate pass will retire them).

Usage: python scripts/bench_forecast.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import os  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.diagnostics import NoFactInDatabaseError  # noqa: E402
from feinsum_tpu.measure import get_roofline_flop_rate  # noqa: E402

DEV = "TPU_v5_lite"


def champion(einsum):
    try:
        qs = sql_utils.query(einsum, f.FakeDevice(DEV))
    except NoFactInDatabaseError:
        return None
    if not qs:
        return None
    qs.sort(key=lambda q: q.total_giga_op_rate, reverse=True)
    return qs[0]


def forecast_rows(rows, long_dim_length=bench.E_BENCH):
    out = []
    for name, einsum, ref_gops in rows:
        q = champion(einsum)
        roof = get_roofline_flop_rate(einsum, DEV,
                                      long_dim_length=long_dim_length,
                                      ignore_unknown_device=True)
        if q is None or not roof:
            print(f"{name:>12s}: NO ARCHIVE FACT")
            out.append((name, None, ref_gops))
            continue
        frac = q.total_giga_op_rate / roof
        proto = ("proto3" if "timing-proto3" in (q.compiler_version or "")
                 else "PRE-PROTO3")
        print(f"{name:>12s}: {q.total_giga_op_rate:8.0f} GOp/s"
              f" = {100 * frac:5.1f}% roofline"
              f"  [{q.transform_id:>14s} {proto}]")
        out.append((name, frac, ref_gops))
    return out


def main():
    print("— headline (archive-champion forecast) —")
    head = forecast_rows(bench.suite())
    ours = [fr for _n, fr, _r in head if fr]
    refs = [bench.reference_roofline_fraction(e, r)
            for (_n, e, r), (_n2, fr, _r2) in zip(bench.suite(), head)
            if fr]
    g = bench.geomean(ours)
    vs = g / bench.geomean(refs) if refs else 0.0
    print(f"predicted headline: geomean {100 * g:.2f}%roofline,"
          f" vs_baseline {vs:.3f}  ({len(ours)}/{len(bench.suite())} rows)")

    print("— extended —")
    forecast_rows(bench.extended_suite())
    print("— tccg sample (plain roofline; bench adds write-ceiling"
          " accounting on top) —")
    forecast_rows([(f"tccg_{i:02d}", f.get_tccg_benchmark(i, dtype="float32"),
                    0.0) for i in bench.TCCG_SAMPLE],
                  long_dim_length=100_000)
    print("— fp64 —")
    forecast_rows(bench.fp64_suite())


if __name__ == "__main__":
    main()
