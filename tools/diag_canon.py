"""Diagnose the driver's canonicalization: for each driver-graded query,
extract Spark and DuckDB results under several plausible extraction paths
(collect/fetchall, toPandas/df, toArrow/arrow) and report, per path, whether
the rendered cells match.  Compared against the driver's verdicts in
CORRECTNESS_r02.json, the path whose pass/fail split reproduces 39/10 is
(almost surely) the driver's.

Usage: python3 tools/diag_canon.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

RED = [
    "ev1_funnel", "q03_hash_agg_tpch_q1", "q21_tumbling_window_batch",
    "q26_pivot_conditional", "q28_cte_top_spender_per_nation",
    "q30_sessionization_batch", "q35_date_trunc_week",
    "q37_shipping_priority", "q38_returned_items",
    "q39_large_quantity_orders",
]
GREEN_SAMPLE = [
    "q06_multiway_join_agg", "q18_math_case_conditional_agg",
    "q22_text_analysis_documents", "q14_union_all", "q17_date_functions",
    "dd1_exact_dedup",
]


def canon_rows(rows, cols):
    """rows: list of dict-like; render every cell with str(), \\N for None."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple("\\N" if r[i] is None else str(r[i]) for i in idx))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or (RED + GREEN_SAMPLE)

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

    summary = {}
    for name in only:
        if name not in osql:
            continue
        df = qs[name](spark, sf_dir)
        cols = df.columns

        # path A: collect / fetchall (row objects)
        sp_rows = [[r[c] for c in cols] for r in df.collect()]
        res = con.execute(osql[name])
        ocols = [d[0] for d in res.description]
        oidx = [ocols.index(c) for c in cols]  # align to spark col order
        du_rows = [[r[i] for i in oidx] for r in res.fetchall()]

        a_sp = canon_rows(sp_rows, cols)
        a_du = canon_rows(du_rows, cols)

        # path B: toPandas / .df()
        pdf = df.toPandas()
        ddf = con.execute(osql[name]).df()
        b_sp = canon_rows(pdf[cols].itertuples(index=False, name=None), cols)
        b_du = canon_rows(ddf[cols].itertuples(index=False, name=None), cols)

        # path C: arrow
        try:
            at = df.toArrow()
        except Exception:
            at = None
        dat = con.execute(osql[name]).arrow()
        if at is not None:
            c_sp = canon_rows(
                [[row[c] for c in cols] for row in at.to_pylist()], cols)
        else:
            c_sp = None
        c_du = canon_rows(
            [[row[c] for c in cols] for row in dat.to_pylist()], cols)

        verdicts = {
            "A_collect": a_sp == a_du,
            "B_pandas": b_sp == b_du,
            "C_arrow": (c_sp == c_du) if c_sp is not None else None,
        }
        # cross paths: spark-pandas vs duck-fetchall etc.
        verdicts["B_sp_vs_A_du"] = b_sp == a_du
        verdicts["A_sp_vs_B_du"] = a_sp == b_du
        summary[name] = verdicts
        # dtype info for first row
        sp_types = [type(v).__name__ for v in (sp_rows[0] if sp_rows else [])]
        du_types = [type(v).__name__ for v in (du_rows[0] if du_rows else [])]
        pd_dtypes = [str(d) for d in pdf.dtypes]
        dd_dtypes = [str(ddf[c].dtype) for c in cols]
        print(f"== {name}")
        print(f"   cols       : {cols}")
        print(f"   spark py   : {sp_types}   pandas: {pd_dtypes}")
        print(f"   duck  py   : {du_types}   pandas: {dd_dtypes}")
        print(f"   verdicts   : {verdicts}")
        for pa, s, d in (("A", a_sp, a_du), ("B", b_sp, b_du), ("C", c_sp, c_du)):
            if s is not None and s != d:
                diff = next(((x, y) for x, y in zip(s, d) if x != y), None)
                print(f"   first diff {pa}: {diff}")

    print()
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
