"""Scale-adaptive scan fan-out (r16 wave 5, guide §2.5 input skew):
the rule, its auto-disable arithmetic, and the partitioning-invariance
contract it leans on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nginx_analytics_spark.sources import load_table
from nginx_analytics_spark.sources.readers import _size_bytes

SF = "/root/testdata/sf0.001"
# documents at sf0.001 is below the broadcast-dim floor (the rule correctly
# skips it); the engage/kill/invariance tests need the bench-scale file.
SF1 = "/root/testdata/sf0.1"


def test_fanout_engages_on_small_scan(spark, monkeypatch):
    """documents at sf0.001 is far under one maxPartitionBytes split, so
    the opt-in fan-out must repartition to defaultParallelism; the
    default path must keep the natural (single-split) scan."""
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    plain = load_table(spark, SF1, "documents")
    fanned = load_table(spark, SF1, "documents", fanout=True)
    target = spark.sparkContext.defaultParallelism
    assert plain.rdd.getNumPartitions() < target
    assert fanned.rdd.getNumPartitions() == target


def test_fanout_env_kill_switch(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "off")
    df = load_table(spark, SF1, "documents", fanout=True)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism


def test_fanout_skips_broadcast_sized_dims(spark, monkeypatch):
    """Tables under the 256 KiB floor (nation) never fan out — they are
    broadcast-join material; an exchange buys nothing."""
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    df = load_table(spark, SF, "nation", fanout=True)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism


def test_fanout_auto_disables_at_scale(spark, monkeypatch):
    """The 100 TB contract: when the natural split count reaches the
    parallelism (here forced by shrinking maxPartitionBytes), the rule
    must NOT add its exchange — the scan is already parallel."""
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096b")
    try:
        df = load_table(spark, SF1, "documents", fanout=True)
        # no RoundRobin repartition node on top of the scan
        assert "RoundRobinPartitioning" not in df._jdf.queryExecution().analyzed().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fanout_result_invariance(spark, monkeypatch):
    """The contract every opted-in registry query leans on: a fanned
    scan computes the same rows (here through an aggregation whose
    float-sum order changes with partitioning — rounded the way the
    engine rounds)."""
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    agg = lambda df: sorted(  # noqa: E731
        (r.source, r.n)
        for r in df.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert agg(load_table(spark, SF1, "documents")) == agg(
        load_table(spark, SF1, "documents", fanout=True)
    )


@pytest.mark.parametrize(
    "s,expect",
    [
        ("128m", 128 << 20),
        ("134217728b", 128 << 20),
        ("1g", 1 << 30),
        ("512k", 512 << 10),
        ("73", 73),
        ("garbage", 128 << 20),
    ],
)
def test_size_bytes_parser(s, expect):
    assert _size_bytes(s) == expect
