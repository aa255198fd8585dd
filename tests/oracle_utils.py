"""Canonical result comparison between a Spark DataFrame and a DuckDB
oracle query — mirrors the driver's gate: row-count + column names +
order-insensitive value comparison (columns sorted by name)."""

from __future__ import annotations

import datetime
import decimal
import math


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: tolerant of last-ulp summation divergence,
        # strict enough to catch real value bugs.
        return f"{v:.12g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc, dc = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if sc != dc:
        diff_idx = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:3]
        for i in diff_idx:
            problems.append(f"row {i}: spark={sc[i]} duckdb={dc[i]}")
        if len(sc) != len(dc):
            problems.append("…row sets differ in size")
        elif not diff_idx:
            problems.append("value mismatch beyond zipped range")
    return problems
