"""Warehouse maintenance: small-file compaction must preserve contents
exactly while collapsing each date partition to one file."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nginx_analytics_spark.sources import load_table
from nginx_analytics_spark.sources.warehouse import Warehouse

SF = "/root/testdata/sf0.001"


def _enriched(spark):
    ev = load_table(spark, SF, "events")
    return ev.select(
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("remote_addr"),
        F.col("value").alias("request_time_seconds"),
        "event_id",
    )


def _parquet_files_per_date(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n and "log_date=" in dirpath:
            out[os.path.basename(dirpath)] = n
    return out


def test_compact_collapses_files_and_preserves_rows(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    src = _enriched(spark)
    # three appends -> >= 3 files in every touched date partition
    for _ in range(3):
        wh.append_raw_logs(src)

    before_files = _parquet_files_per_date(wh.path("raw_logs"))
    assert before_files and all(n >= 3 for n in before_files.values())
    before = (
        wh.table("raw_logs")
        .groupBy("log_date")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.hash("remote_addr", "event_id").cast("bigint")).alias("sig"),
        )
        .collect()
    )

    total = wh.compact_raw_logs()

    after_files = _parquet_files_per_date(wh.path("raw_logs"))
    assert set(after_files) == set(before_files)
    assert all(n == 1 for n in after_files.values()), after_files
    assert total == len(after_files)
    after = (
        wh.table("raw_logs")
        .groupBy("log_date")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.hash("remote_addr", "event_id").cast("bigint")).alias("sig"),
        )
        .collect()
    )
    key = lambda rows: {str(r.log_date): (r.n, r.sig) for r in rows}  # noqa: E731
    assert key(after) == key(before)
    # window reads still work post-swap (catalog/path integrity)
    assert wh.raw_logs_window("2024-01-31 00:00:00", 7).count() > 0


def test_compact_rerunnable_after_crash_artifacts(spark, tmp_path):
    """A stale __compact_old dir (crash after the swap) must not wedge the
    next run; a missing live dir with old present (crash between renames)
    must roll forward."""
    import os
    import shutil

    wh = Warehouse(spark, str(tmp_path))
    wh.append_raw_logs(_enriched(spark))
    n_before = wh.table("raw_logs").count()
    src = wh.path("raw_logs")

    # crash after swap: old left behind
    shutil.copytree(src, src + "__compact_old")
    assert wh.compact_raw_logs() > 0
    assert not os.path.exists(src + "__compact_old")
    assert wh.table("raw_logs").count() == n_before

    # crash between renames: live dir gone, old holds the table
    os.rename(src, src + "__compact_old")
    assert wh.compact_raw_logs() > 0
    assert wh.table("raw_logs").count() == n_before
