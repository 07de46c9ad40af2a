"""Batch sources.

The reference's sources are Kafka (streaming, reference ingestor/main.py:57-63)
and a JDBC-subquery back-channel to Postgres (reference
predictions/anomaly_detection.py:33-53). In this engine every batch source is
a columnar scan that Catalyst can push filters/projections into:

  * Parquet fixture tables (the TPC-H-ish star + events/documents/embeddings).
  * JSONL nginx access-log files parsed against the canonical 38-field schema
    (no schema inference — fixed StructType, like the reference's from_json).

Nanosecond-timestamp parquet: Spark has no TIMESTAMP(NANOS) type, so columns
written as ns (e.g. events.ts) are read as epoch-nano longs
(``spark.sql.legacy.parquet.nanosAsLong``) and normalized to microsecond
TIMESTAMP with integer division — bit-identical to DuckDB's
``CAST(ts_ns AS TIMESTAMP)`` truncation, which keeps oracle comparisons
exact. Detection uses a single parquet footer (driver-side metadata read,
O(1) regardless of table size).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nginx_analytics_spark.schema import NGINX_LOG_SCHEMA

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — from one file footer."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked into the image
        return []
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        if str(field.type).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_parquet(
    spark: SparkSession, path: str, fanout: bool = False
) -> DataFrame:
    """Parquet scan with ns-timestamp normalization.

    Scale note: range predicates on a normalized ns column cannot reach the
    parquet scan (the filter targets the *computed* µs column), so row-group
    pruning is lost — acceptable for the fixtures only. Production tables
    written by this engine store TIMESTAMP(MICROS) (see sources.warehouse),
    where timestamp pushdown and date-partition pruning work natively.

    ``fanout=True`` opts this scan into the scale-adaptive small-scan
    fan-out (see :func:`_fan_out_small_scan`) — callers whose scan stage
    does heavy per-row CPU (shingling, window generation, scoring, regex)
    set it; scan-bound aggregations and queries that immediately
    re-exchange on a key must not.
    """
    ns_cols = _ns_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # div (integer division) keeps full precision on epoch-nanos;
        # a float division would round at the 2^53 mantissa boundary.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if fanout:
        df = _fan_out_small_scan(spark, df, path)
    return df


# Floor below which a table is a broadcast-sized dim (region/nation/
# supplier/part): fanning those out buys nothing and costs an exchange.
_FANOUT_MIN_BYTES = 256 << 10

_SIZE_UNITS = {"k": 10, "m": 20, "g": 30, "t": 40}


def _size_bytes(s: str) -> int:
    """Spark size-string ("128m", "134217728b", "1g") to bytes; falls back
    to the maxPartitionBytes default on anything unparseable."""
    try:
        v = s.strip().lower().rstrip("b")
        if v and v[-1] in _SIZE_UNITS:
            return int(v[:-1]) << _SIZE_UNITS[v[-1]]
        return int(v)
    except (ValueError, IndexError):
        return 128 << 20


def _fan_out_small_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Scale-adaptive scan fan-out (optimization guide §2.5 "input skew:
    one huge unsplittable file ... repartition immediately after the read",
    §2.6 idle capacity).

    A parquet file smaller than ``spark.sql.files.maxPartitionBytes`` with
    a single row group scans as ONE task, so every per-row-heavy operator
    downstream (shingling, window generation, quality scoring, regex
    redaction) serializes its whole scan-stage CPU onto one core while the
    other N-1 idle — measured at 1.0-1.3 s of the corpus queries' wall at
    sf0.1 on local[32] (see OPTIMIZATION_r16.md wave 5). The fix is the
    guide's: a round-robin repartition immediately after the read, applied
    ONLY when the scan's natural split count (file bytes / maxPartitionBytes,
    Spark's own split arithmetic) is below the cluster's default parallelism.
    At 100 TB the split count dwarfs any core count, the rule never fires,
    and every "this operator adds no keyed shuffle" scale invariant stands
    unchanged (the plan tests assert those invariants on hashpartitioning /
    rangepartitioning exchanges, which this never adds). Results are
    partitioning-invariant by the engine's standing contract: the oracle
    harness already exercises every query under a different layout
    (local[8]/8 shuffle partitions) than the bench (local[32]/32).

    Opt-in per call site (measured, wave 5): it pays exactly where the
    scan stage is CPU-bound and is pure overhead where the scan feeds a
    cheap aggregation (pricing_summary-style scan-aggs read ~0.7 s WORSE
    with a blanket fan-out) or an immediate keyed exchange (user_sessions'
    window repartitions by user_id anyway).

    ``SPARK_GRAFT_SCAN_FANOUT=off`` disables the rule globally
    (measurement / debugging); it is never required for correctness.
    """
    if os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "auto") == "off":
        return df
    try:
        if os.path.isdir(path):
            # os.walk, not listdir (r16 ADVICE): a partitioned dataset
            # nests its files under key=value dirs, and a top-level-only
            # sum read 0 — silently never fanning such layouts out.
            size = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        # Non-local storage (hdfs://, s3a://): big-data territory where the
        # natural split count is the parallelism story; never fan out.
        return df
    if size < _FANOUT_MIN_BYTES:
        return df
    max_split = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    )
    target = spark.sparkContext.defaultParallelism
    if (size + max_split - 1) // max_split >= target:
        return df
    return df.repartition(target)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fanout: bool = False
) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    ``fanout=True``: see :func:`read_parquet` — for callers whose scan
    stage is per-row-CPU-bound."""
    return read_parquet(
        spark, os.path.join(sf_dir, f"{name}.parquet"), fanout=fanout
    )


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every fixture table as a temp view (the catalog surface the
    reference exposed through Superset datasets, reference
    superset/setup_dashboards.py:54-59)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file-backed STREAMING source.

    Spark's file stream source requires a directory, so the single fixture
    file is staged via symlink under /tmp (testdata itself is read-only).

    The timestamp unit is DETECTED from the parquet footer, mirroring the
    batch reader: a TIMESTAMP(NANOS) fixture arrives as epoch-nano long
    (``nanosAsLong`` shim) and is normalized to a µs timestamp; a
    TIMESTAMP(MICROS) fixture streams natively as TIMESTAMP_NTZ (the same
    type the batch scan infers). Hardcoding either unit silently shears
    event time by 1000× when the fixture is regenerated with the other —
    observed as watermarks in 1970 and zero emitted session windows.
    """
    from pyspark.sql import types as T

    src = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        "/tmp",
        "nas_stream_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    # lexists: a broken symlink must be replaced, not tripped over; and a
    # live link pointing at a different fixture must be re-created, or a
    # stale stage dir would silently stream old data.
    if os.path.lexists(link):
        if os.path.islink(link) and os.readlink(link) == src:
            pass  # already staged correctly
        else:
            os.remove(link)
            os.symlink(src, link)
    else:
        os.symlink(src, link)
    # Read ts as raw epoch long in EITHER unit (a LongType user schema
    # yields epoch-nanos from TIMESTAMP(NANOS) files under the nanosAsLong
    # shim, epoch-micros from TIMESTAMP(MICROS) files), then normalize to
    # µs. Watermarks require TIMESTAMP (ltz) — timestamp_micros provides
    # it; the session timezone is UTC so the wire values match the
    # batch scan's NTZ reading and the DuckDB oracles.
    ts_is_nanos = "ts" in _ns_timestamp_columns(src)
    if ts_is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(stage)
    ts_micros = F.expr("ts div 1000") if ts_is_nanos else F.col("ts")
    return stream.withColumn("ts", F.timestamp_micros(ts_micros))


def read_nginx_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read nginx access-log JSONL with the fixed wire schema.

    Equivalent of the reference's Kafka-value ``from_json`` path
    (reference ingestor/main.py:66-67) for file-backed input: PERMISSIVE
    mode, malformed rows -> all-NULL, no inference.
    """
    return spark.read.schema(NGINX_LOG_SCHEMA).json(path)
