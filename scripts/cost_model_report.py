"""Rank-correlate the analytic cost model against every archived
measurement (CPU/sqlite only — no TPU touch).  Per einsum class: Spearman
rho between predicted and measured runtimes over all finite archive rows,
plus where the measured champion lands in the predicted ranking (the
number that matters for proposal ranking: if the champion is in the
predicted top-20%, model-guided search finds it ~5x sooner)."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.codegen.program import get_index_lengths  # noqa: E402
from feinsum_tpu.tuning import (  # noqa: E402
    get_transform_func_from_module_path,
)
from feinsum_tpu.tuning.cost_model import predict_for_params  # noqa: E402

DEVICE_KEY = "TPU_v5_lite"


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    d = float(np.sqrt((ra * ra).sum() * (rb * rb).sum()))
    return float((ra * rb).sum() / d) if d else 0.0


def main():
    rows_by_class: dict = {}
    for e in sql_utils.get_timed_einsums_in_db():
        key = e.get_subscripts() + " " + next(
            iter(sorted({dt.name for dt in e.arg_to_dtype.values()})))
        rows_by_class.setdefault(key, e)

    report = []
    for key, e in sorted(rows_by_class.items()):
        qs = [q for q in sql_utils.query(e, f.FakeDevice("TPU v5 lite"),
                                         err_if_no_results=False)
              if np.isfinite(q.runtime_in_sec)]
        if len(qs) < 5:
            continue
        lengths = get_index_lengths(e, 1_000_000)
        # the archive stores op_info at the row's own long length; use the
        # dominant one (they're almost all 1M / 500k / 100k)
        preds, meas = [], []
        spaces: dict = {}
        for q in qs:
            sp = spaces.get(q.transform_id)
            if sp is None:
                try:
                    sp = get_transform_func_from_module_path(q.transform_id)
                except Exception:  # noqa: BLE001
                    continue
                spaces[q.transform_id] = sp
            p = predict_for_params(sp, e, dict(q.transform_params),
                                   lengths, DEVICE_KEY)
            if p is None:
                continue
            preds.append(p)
            meas.append(q.runtime_in_sec)
        if len(preds) < 5:
            continue
        preds, meas = np.asarray(preds), np.asarray(meas)
        rho = spearman(preds, meas)
        champ = int(np.argmin(meas))
        champ_rank = int(np.sum(preds < preds[champ]))
        report.append((key, len(preds), rho, champ_rank, len(preds)))
        print(f"{key:40s} n={len(preds):3d} rho={rho:+.2f} "
              f"champion at predicted rank {champ_rank + 1}/{len(preds)}",
              flush=True)
    if report:
        rhos = [r[2] for r in report]
        frac = [r[3] / max(1, r[4] - 1) for r in report]
        print(f"\n{len(report)} classes: median rho {np.median(rhos):+.2f},"
              f" median champion percentile {100 * np.median(frac):.0f}%")


if __name__ == "__main__":
    main()
