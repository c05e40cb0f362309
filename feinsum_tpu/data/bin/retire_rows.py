"""Delete archive rows that no longer reproduce (e.g. recorded under an
older emitter whose generated code has since changed).  The replay path
picks the max recorded rate, so one stale over-optimistic row shadows every
honest one — bench r2 caught div@ndof=10 replaying a 432 us row that now
measures ~555 us live (VERDICT r1 weak #4 family).

Select rows by subscripts (exact canonical string), transform_id, and/or a
params JSON substring; always prints what it deletes."""
import argparse
import json

from feinsum_tpu import sql_utils


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default=sql_utils.DEFAULT_DB)
    ap.add_argument("--subscripts", help="canonical subscripts, exact")
    ap.add_argument("--transform-id")
    ap.add_argument("--params-contains",
                    help="substring of the params JSON, e.g. '\"jfold\": false'")
    ap.add_argument("--runtime-below", type=float,
                    help="only rows with runtime_in_sec < this")
    ap.add_argument("--compiler-contains",
                    help="substring of compiler_version — e.g. a retired"
                         " timing-protocol tag ('timing-proto2') or an old"
                         " jax version")
    ap.add_argument("--compiler-missing",
                    help="rows whose compiler_version LACKS this substring"
                         " (e.g. purge everything not measured under"
                         " 'timing-proto3')")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    conn = sql_utils._connect(args.db)
    try:
        where, binds = [], []
        if args.subscripts:
            where.append("subscripts = ?")
            binds.append(args.subscripts)
        if args.transform_id:
            where.append("transform_id = ?")
            binds.append(args.transform_id)
        if args.params_contains:
            where.append("transform_params LIKE ?")
            binds.append(f"%{args.params_contains}%")
        if args.runtime_below is not None:
            where.append("runtime_in_sec < ?")
            binds.append(args.runtime_below)
        if args.compiler_contains:
            where.append("compiler_version LIKE ?")
            binds.append(f"%{args.compiler_contains}%")
        if args.compiler_missing:
            where.append("compiler_version NOT LIKE ?")
            binds.append(f"%{args.compiler_missing}%")
        if not where:
            raise SystemExit("refusing to delete every row: pass a filter")
        cond = " AND ".join(where)
        rows = conn.execute(
            f"SELECT rowid, subscripts, transform_id, transform_params,"
            f" runtime_in_sec FROM {sql_utils.TIMINGS_TABLENAME}"
            f" WHERE {cond}", binds).fetchall()
        for rid, subs, tid, params, rt in rows:
            print(f"{'DRY ' if args.dry_run else ''}retire rowid={rid}"
                  f" {subs} {tid} {rt*1e6:.0f}us"
                  f" {json.loads(params) if len(params) < 200 else '...'}")
        if not args.dry_run and rows:
            sql_utils.retire_rows_where(cond, binds, reason="retire_rows.py",
                                        conn=conn)
            conn.commit()
        print(f"{len(rows)} row(s) {'matched' if args.dry_run else 'retired'}")
    finally:
        conn.close()


if __name__ == "__main__":
    main()
