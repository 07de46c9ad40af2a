"""SparkSession factory tuned for this engine.

Local test profile runs on ``local[N]`` (single JVM); the same builder
settings are what we would ship to a 1000-executor cluster, with the two
size-dependent knobs (shuffle partitions, broadcast threshold) exposed as
arguments so a cluster deployment can raise them (rule of thumb at 100 TB:
shuffle partitions ~= 2-3x total cores, target ~128-200 MB per shuffle
partition; AQE coalescing makes the exact number forgiving).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# UTC everywhere: the reference's timestamps are ISO-8601 wall-clock; the
# DuckDB oracle is TZ-naive. Pinning the session TZ makes to_timestamp /
# date_trunc / hour deterministic and oracle-comparable.
_BASE_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-planning — coalesces small shuffle partitions,
    # converts sort-merge to broadcast when the built side turns out small,
    # and splits skewed partitions (critical for per-IP/per-key log skew).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # parallelismFirst stays at Spark's default (true), MEASURED r17:
    # false (the production-docs suggestion — coalesce to advisory SIZE)
    # serialized every CPU-heavy low-shuffle-byte reduce stage at bench
    # scale (prefix-family windows x2 worse, interleaved A/B) because
    # AQE sizes by bytes and cannot see per-row CPU. At 100 TB initial
    # partitions exceed the advisory size anyway, so flipping it buys
    # nothing there either.
    # Arrow for any pandas-UDF / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet: vectorized reader + pushdown are on by default; keep
    # dictionary filtering explicit for readability.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Read timestamps the way they were written (no rebase surprises).
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # Wide query suites generate hundreds of codegen classes; the JVM's
    # default 240 MB code cache fills, HotSpot disables the compiler, and
    # random queries drop to interpreted mode (observed as 10-60x
    # slowdowns landing on a different query each run). Reserve 1 GB and
    # let the sweeper reclaim cold compiled code.
    "spark.driver.extraJavaOptions": (
        "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"
    ),
    "spark.ui.enabled": "false",
    # PySpark 4 wraps every DataFrame/Column API call to capture the
    # Python call site for error context — a stack walk plus up to three
    # extra py4j round trips (origin set, conf read, origin clear) PER
    # CALL. Profiled at ~25-35% of DataFrame build time on the
    # column-heavy operators (64-column simhash aggregation, the z-score
    # chain); pure driver-side latency at any cluster size. Disabled:
    # errors lose the "was added in file:line" Python frame, nothing
    # else. Flip to true when debugging a query interactively
    # (SPARK_GRAFT_DF_DEBUG=true re-enables it without a code edit).
    "spark.python.sql.dataFrameDebugging.enabled": os.environ.get(
        "SPARK_GRAFT_DF_DEBUG", "false"
    ),
}


def get_spark(
    app_name: str = "nginx_analytics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Defaults are sized for the local[32] test harness; on a cluster pass
    ``master=None`` (use spark-submit's) and a larger ``shuffle_partitions``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if driver_memory or not os.environ.get("SPARK_MASTER"):
        conf["spark.driver.memory"] = driver_memory or "48g"
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
