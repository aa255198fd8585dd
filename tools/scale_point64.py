"""64x scale point for the steepest growers (round-9 directive #6):
tx14 containment and the dd2/q87 near-dup family. The 16x/32x smokes
established answer-bound growth; this doubling pins the trend line —
µs-per-output-unit must stay flat (or fall) from 32x to 64x, or a
super-linear term is hiding under the answer growth.

Usage: python3 tools/scale_point64.py [N_COPIES]  (default 64)
Prints one markdown table row per op with wall-clock AND the measured
answer size, so the per-output cost is computed from THIS run, not
assumed. Run on an idle host (bench-isolation rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import SF, build_scaled  # noqa: E402


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = sys.argv[2:]
    from goose_spark.queries import load_all
    from goose_spark.session import get_spark

    registry = load_all()
    spark = get_spark("gosling-scale64")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    scaled = build_scaled(spark, n_copies)
    print(f"built {n_copies}x dataset in {time.perf_counter() - t0:.0f}s",
          flush=True)
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    print(f"| operator | {n_copies}x sec | answer size | µs/output |")
    print("|---|---|---|---|", flush=True)

    def timed(name, sf_dir):
        t0 = time.perf_counter()
        df = registry[name].builder(spark, sf_dir)
        if name == "q87_triangle_count":
            row = df.collect()[0]
            wall = time.perf_counter() - t0
            wedges = row["n_wedges"]
            print(
                f"| {name} | {wall:.1f} | {row['n_edges']} edges / "
                f"{wedges} wedges / {row['n_triangles']} triangles "
                f"| {1e6 * wall / max(wedges, 1):.2f} /wedge |",
                flush=True,
            )
        else:
            n = df.count()
            wall = time.perf_counter() - t0
            print(
                f"| {name} | {wall:.1f} | {n} pairs "
                f"| {1e6 * wall / max(n, 1):.2f} /pair |",
                flush=True,
            )

    for name in (only or ("dd2_minhash_lsh", "tx14_containment",
                          "q87_triangle_count")):
        timed(name, scaled)


if __name__ == "__main__":
    main()
