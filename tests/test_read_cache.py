"""Memoized table reads (queries/base.py:_READ_CACHE) and the explicit
invalidation hook — the cache pins a DataFrame's resolved file listing,
so regenerating parquet under a cached dir needs an eviction path."""

from __future__ import annotations

import os

import pandas as pd

from goose_spark.queries.base import _READ_CACHE, invalidate_read_cache, t


def _write(dir_, n, part="part0"):
    os.makedirs(os.path.join(dir_, "mini.parquet"), exist_ok=True)
    pd.DataFrame({"x": list(range(n))}).to_parquet(
        os.path.join(dir_, "mini.parquet", f"{part}.parquet"), index=False
    )


def test_invalidate_evicts_stale_listing(spark, tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    _write(d, 3)
    assert t(spark, d, "mini").count() == 3
    # append a new file under the cached dir: the memoized plan pinned
    # the old file LISTING, so it still resolves 3 rows
    _write(d, 5, part="part1")
    assert t(spark, d, "mini").count() == 3  # stale by design
    assert invalidate_read_cache(d) == 1
    assert t(spark, d, "mini").count() == 8


def test_invalidate_all_clears_every_entry(spark, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        os.makedirs(d)
        _write(d, 2)
        t(spark, d, "mini")
    before = len(_READ_CACHE)
    assert before >= 2
    assert invalidate_read_cache() == before
    assert len(_READ_CACHE) == 0


def test_invalidate_other_dir_is_noop(spark, tmp_path):
    d = str(tmp_path / "c")
    os.makedirs(d)
    _write(d, 2)
    t(spark, d, "mini")
    assert invalidate_read_cache(str(tmp_path / "nope")) == 0
    assert t(spark, d, "mini").count() == 2
