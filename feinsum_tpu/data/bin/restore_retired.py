"""Restore rows from the retired-facts stash back into the live timing
table (the inverse of the non-destructive retire in sql_utils.
retire_rows_where).  Motivation: a live r4 incident where contention-
polluted re-timings made the over-reporter retire pass remove two honest
champion rows — restoring beats re-measuring when the row was fine.

Usage:
    python feinsum_tpu/data/bin/restore_retired.py --list
    python feinsum_tpu/data/bin/restore_retired.py \
        --subscripts "ik,il,ljk -> ij" [--transform-id dg_div_v0.py] \
        [--dry-run]
"""
import argparse
import sqlite3

from feinsum_tpu import sql_utils


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default=sql_utils.DEFAULT_DB)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--subscripts")
    ap.add_argument("--transform-id")
    ap.add_argument("--reason-contains")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    conn = sql_utils._connect(args.db)   # ensures the timings table too
    try:
        # a DB where no retire ever ran has no stash table: report empty
        # instead of a raw OperationalError (review r4 #6)
        conn.execute(f"""
            CREATE TABLE IF NOT EXISTS {sql_utils.RETIRED_TABLENAME} AS
            SELECT *, '' AS retire_reason, '' AS retired_at
            FROM {sql_utils.TIMINGS_TABLENAME} WHERE 0""")
        if args.list:
            for row in conn.execute(
                    f"SELECT rowid, subscripts, transform_id,"
                    f" runtime_in_sec, retire_reason, retired_at"
                    f" FROM {sql_utils.RETIRED_TABLENAME}"):
                rid, subs, tid, rt, reason, at = row
                print(f"rowid={rid} [{subs}] {tid} {rt * 1e6:.0f}us"
                      f" retired {at}: {reason}")
            return
        where, binds = [], []
        if args.subscripts:
            where.append("subscripts = ?")
            binds.append(args.subscripts)
        if args.transform_id:
            where.append("transform_id = ?")
            binds.append(args.transform_id)
        if args.reason_contains:
            where.append("retire_reason LIKE ?")
            binds.append(f"%{args.reason_contains}%")
        if not where:
            raise SystemExit("refusing to restore every row: pass a filter"
                             " (or --list)")
        cond = " AND ".join(where)
        rows = conn.execute(
            f"SELECT rowid, subscripts, transform_id, runtime_in_sec"
            f" FROM {sql_utils.RETIRED_TABLENAME} WHERE {cond}",
            binds).fetchall()
        for rid, subs, tid, rt in rows:
            print(f"{'DRY ' if args.dry_run else ''}restore rowid={rid}"
                  f" [{subs}] {tid} {rt * 1e6:.0f}us")
        if not args.dry_run and rows:
            # the timings table's own column list IS the restore set (the
            # stash adds retire_reason/retired_at at the end); no slicing
            # constant to rot if the schema grows (review r4 #3)
            cols = [d[1] for d in conn.execute(
                f"PRAGMA table_info({sql_utils.TIMINGS_TABLENAME})")]
            collist = ", ".join(cols)
            conn.execute(
                f"INSERT INTO {sql_utils.TIMINGS_TABLENAME} ({collist})"
                f" SELECT {collist} FROM {sql_utils.RETIRED_TABLENAME}"
                f" WHERE {cond}", binds)
            conn.execute(
                f"DELETE FROM {sql_utils.RETIRED_TABLENAME} WHERE {cond}",
                binds)
            conn.commit()
        print(f"{len(rows)} row(s)"
              f" {'matched' if args.dry_run else 'restored'}")
    finally:
        conn.close()


if __name__ == "__main__":
    main()
