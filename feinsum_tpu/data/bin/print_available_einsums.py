"""Print every einsum recorded in a transform archive, with its best fact
(parity: reference data/bin/print_available_einsums.py)."""
import argparse

from feinsum_tpu import sql_utils


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default=sql_utils.DEFAULT_DB)
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    for e in sql_utils.get_timed_einsums_in_db(db_path=args.db,
                                               device=args.device):
        print("=" * 70)
        print(e)
        try:
            qs = sql_utils.query(e, args.device, db_path=args.db)
        except sql_utils.NoFactInDatabaseError:
            continue
        best = max(qs, key=lambda q: q.total_giga_op_rate)
        print(f"  {len(qs)} facts; best {best.total_giga_op_rate:.1f} GOp/s"
              f" via {best.transform_id} {dict(best.transform_params)}")


if __name__ == "__main__":
    main()
