"""Benchmark harness: runs the declared query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized via ``df.count()`` after a cache-free
build — wall-clock includes scan + shuffle + agg, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from goose_spark.queries import load_all
    from goose_spark.session import get_spark

    spark = get_spark("gosling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # warm the JVM + parquet footers once with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(registry):
        spec = registry[name]
        start = time.perf_counter()
        try:
            df = spec.builder(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - start, 4)
        except Exception as exc:  # pragma: no cover
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    ok = [v for v in timings.values() if v >= 0]
    out = {
        "metric": "declared-query wall-clock (sum over inventory)",
        "value": round(sum(ok), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_queries": len(timings),
        "failed": sorted(k for k, v in timings.items() if v < 0),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
