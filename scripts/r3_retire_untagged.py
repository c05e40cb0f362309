"""Retire untagged (pre-proto3) archive rows that over-report past their
class's proto3-re-timed champion (VERDICT r2 next #2 / weak #2).

Replay picks the max recorded rate, so an untagged row claiming a higher
rate than any proto3 measurement shadows every honest fact.  After
scripts/r3_reevaluate.sh re-times the top-2 per class, this deletes, per
(class, transform), the untagged rows whose recorded rate exceeds the best
proto3 rate by > *margin* (default 3%% — within-protocol rank drift is ~2%%,
CLAUDE.md).  Classes with NO proto3 rows are left alone (not yet re-timed).

CPU/sqlite only — never touches the TPU.
"""
import argparse
import sqlite3

import jax

jax.config.update("jax_platforms", "cpu")

from feinsum_tpu import sql_utils  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default=sql_utils.DEFAULT_DB)
    ap.add_argument("--device", default="TPU_v5_lite")
    ap.add_argument("--margin", type=float, default=0.03)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    conn = sqlite3.connect(args.db)
    n_deleted = 0
    for e in sql_utils.get_timed_einsums_in_db(db_path=args.db,
                                               device=args.device):
        try:
            qs = sql_utils.query(e, args.device, db_path=args.db,
                                 err_if_no_results=False)
        except Exception as ex:  # noqa: BLE001
            print(f"skip {e.get_subscripts()}: {type(ex).__name__}: "
                  f"{str(ex)[:120]}")
            continue
        tagged = [q for q in qs
                  if sql_utils.TIMING_PROTOCOL_TAG in q.compiler_version]
        if not tagged:
            continue
        best = max(q.total_giga_op_rate for q in tagged)
        cutoff = best * (1.0 + args.margin)
        for q in qs:
            if sql_utils.TIMING_PROTOCOL_TAG in q.compiler_version:
                continue
            if q.total_giga_op_rate <= cutoff:
                continue
            print(f"retire [{e.get_subscripts()}] {q.transform_id}"
                  f" {dict(q.transform_params)}: {q.total_giga_op_rate:.0f}"
                  f" GOp/s untagged > proto3 best {best:.0f}")
            if not args.dry_run:
                # (subscripts, id, runtime, compiler) identifies the row:
                # the runtime float is read back from this same row, so
                # equality is exact; a duplicate row caught by it is a
                # duplicate of the same over-reporting fact.  Rows move to
                # the retired-facts stash (recoverable), not DELETE.
                n_deleted += sql_utils.retire_rows_where(
                    "subscripts = ? AND device_name = ? AND"
                    " transform_id = ? AND runtime_in_sec = ? AND"
                    " compiler_version = ?",
                    (e.get_subscripts(), args.device, q.transform_id,
                     q.runtime_in_sec, q.compiler_version),
                    reason=f"untagged over-reporter > proto3 best {best:.0f}"
                           f" GOp/s", conn=conn)
    conn.commit()
    print(f"retired {n_deleted} untagged over-reporting rows"
          f"{' (dry run)' if args.dry_run else ''}")


if __name__ == "__main__":
    main()
