"""Full driver-style correctness gate: run EVERY `queries()` entry with a
vanilla SparkSession (the grading driver builds its own — no
goose_spark.session config) against its `oracle_sql()` twin in DuckDB at
sf0.01, comparing column names (sorted) and stringified values.

Usage:  python3 tools/oracle_gate.py [sf_dir]
Exit code 0 iff every oracled query matches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name in sorted(qs):
        if name not in osql:
            print(f"SKIP (rows-only, no oracle): {name}")
            continue
        try:
            df = qs[name](spark, sf_dir)
            cols = sorted(df.columns)
            sp = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            du = sorted(tuple(str(r[i]) for i in idx) for r in res.fetchall())
            if sorted(ocols) != cols:
                status = f"COLUMN MISMATCH spark={cols} duckdb={sorted(ocols)}"
            elif sp != du:
                diff = next(
                    (a, b) for a, b in zip(sp + [None], du + [None]) if a != b
                )
                status = f"VALUE MISMATCH ({len(sp)} vs {len(du)} rows; first diff {diff})"
            else:
                status = "OK"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            status = f"ERROR {ex}"[:200]
        if status != "OK":
            bad.append(name)
            print(f"FAIL {name}: {status}")
        # drop ONLY per-query persist_shared() frames (plans/guards.py);
        # cross-query session caches (pair table, k-means) stay warm
        from goose_spark.plans.guards import release_shared

        release_shared()
    print(f"checked {len(osql)} oracled queries, {len(bad)} failing")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
