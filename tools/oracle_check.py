"""Standalone oracle sweep: python tools/oracle_check.py [sf_dir] [keys...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ingest.session import get_spark
from stellar_ingest.verify.oracle import check_key, duckdb_connect


def main():
    args = [a for a in sys.argv[1:]]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    keys = args[1:] if args and os.path.isdir(args[0]) else args
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    con = duckdb_connect(sf)
    failed = []
    for name, qfn in qs.items():
        if keys and name not in keys:
            continue
        t0 = time.monotonic()
        try:
            res = check_key(spark, con, sf, name, qfn, oracles.get(name))
        except Exception as exc:  # noqa: BLE001
            res = {"key": name, "ok": False, "error": str(exc)[:300]}
        dt = time.monotonic() - t0
        status = "OK " if res.get("ok") else "FAIL"
        print(f"{status} {name:24s} {dt:6.1f}s {res.get('mode', '?'):9s} "
              f"rows={res.get('rows_spark')}")
        if not res.get("ok"):
            failed.append(name)
            for k in ("error", "cols_spark", "cols_oracle", "rows_oracle", "first_diffs"):
                if k in res:
                    print(f"     {k}: {res[k]}")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall green")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
