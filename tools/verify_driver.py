"""Replicate the grading driver's correctness check (verify skill §1).

Runs every registry query through Spark AND its DuckDB oracle at the
given SF and repr-compares (stricter than the driver's hash).

Usage: python -u tools/verify_driver.py [sf_dir] [start] [stop]
       (start/stop slice the registry order, for chunked runs)
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from migrator_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    stop = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark("verify")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = 0
    names = list(qs)[start:stop]
    for name in names:
        fn = qs[name]
        try:
            if name not in osql:
                print("rows-only", name, fn(spark, sf).count(), flush=True)
                continue
            sp = fn(spark, sf).toPandas()
            dp = con.sql(osql[name]).df()
            cols = sorted(sp.columns)
            ok = (
                sorted(dp.columns) == cols
                and len(sp) == len(dp)
                and sorted(map(repr, sp[cols].itertuples(index=False, name=None)))
                == sorted(map(repr, dp[cols].itertuples(index=False, name=None)))
            )
        except Exception as exc:  # pragma: no cover - diagnostic path
            bad += 1
            print("ERROR", name, repr(exc)[:200], flush=True)
            continue
        if not ok:
            bad += 1
        print("OK" if ok else "MISMATCH", name, len(sp), flush=True)
    print(f"DONE mismatches={bad} of={len(names)}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
