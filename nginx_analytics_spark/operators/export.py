"""Deterministic shuffle-shard export — the training-data hand-off.

A pretraining run wants the curated corpus as N shards, (a) globally
shuffled so any prefix is an unbiased sample (sequential readers must not
see ingest order: a source- or time-sorted corpus trains badly), and
(b) bit-reproducible so a re-run of the export produces byte-identical
shards regardless of cluster size or partitioning.

``df.repartition(N)`` + ``rand()`` fails both: round-robin/random both
depend on the input split layout. Instead the shard AND the intra-shard
order are pure functions of the row key via the engine-portable Knuth
multiplicative hash (operators.sampling):

    h(key)  = (key * 2654435761) mod 2^32        -- golden-ratio scramble
    shard   = floor(h * n_shards / 2^32)          -- HIGH bits: decorrelated
    pos     = rank of (h, key) within the shard   -- "shuffled" read order

Scale: one hash exchange on ``shard`` (n_shards partitions — size
n_shards ~ thousands at 100 TB so each holds a few tens of GB), then a
per-partition sort; no global ORDER BY (a single-range sort of the full
corpus is the anti-pattern this module replaces). The window in
:func:`shard_assignments` partitions BY shard, so its state is one
partition's rows, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.operators.sampling import KNUTH, M32


def shard_hash(key: str) -> F.Column:
    """The portable shard-scramble hash, total over ALL bigint keys.

    ``pmod(key * KNUTH, 2^32)``: the int64 product wraps mod 2^64 for
    keys >= ~3.47e9, but 2^32 divides 2^64, so the wrapped (possibly
    negative) value is still congruent to the true product mod 2^32 and
    ``pmod`` lands it in [0, 2^32) — the hash is exact for every int64
    key, with no silent negative shards. For keys inside the
    oracle-portable domain (< 2^31.7, operators.sampling) the product
    never wraps and pmod == %, so this is bit-identical to the DuckDB
    twin there; beyond it the Spark result stays well-defined but DuckDB
    (which errors on int64 overflow) can no longer mirror it."""
    return F.pmod(F.col(key).cast("bigint") * F.lit(KNUTH), F.lit(M32))


def shard_ids(df: DataFrame, key: str = "doc_id", n_shards: int = 8) -> DataFrame:
    """``df`` plus ``_h`` (scramble hash) and ``shard`` — the windowless
    half of the manifest, cheap enough to reuse for counting.

    shard from the HIGH bits of the hash (floor(h * n / 2^32)), never
    `h % n`: the Knuth multiplier is odd with K ≡ 1 (mod 16), so for a
    power-of-two n the low bits of k*K mod 2^32 are the low bits of k —
    `h % 8` would be doc_id % 8 exactly, re-correlating shards with any
    id-allocation pattern. High bits carry the golden-ratio scramble.
    h * n ≤ 2^35ish < 2^53 and the divisor is a power of two, so the
    double arithmetic is exact and engine-portable.
    """
    return df.withColumn("_h", shard_hash(key)).withColumn(
        "shard",
        F.floor(F.col("_h") * n_shards / F.lit(float(M32))).cast("bigint"),
    )


def shard_assignments(
    df: DataFrame, key: str = "doc_id", n_shards: int = 8
) -> DataFrame:
    """The export manifest: every row's shard and intra-shard position.

    Deterministic, partition-invariant, engine-portable — the same rows
    land in the same shard at the same position on any cluster (property-
    tested under repartition in tests/test_export.py, oracle-matched as
    ``shard_manifest``).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(key).asc())
    return (
        shard_ids(df, key, n_shards)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )


def write_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    n_shards: int = 8,
) -> int:
    """Materialize the shards: one Parquet directory per shard, rows
    stored in shuffled (hash) order.

    ``repartitionByRange(n_shards, shard)`` keeps each shard VALUE whole
    in a single task (range boundaries never split equal values), so
    every ``shard=i`` directory is written as ONE file. Boundaries come
    from sampled quantiles, so a task may legitimately hold two adjacent
    shard values (and another task none) — fewer than one task per value,
    never more. Hash ``repartition`` would be worse: murmur3 over the
    0..n-1 values collides several shards into one straggler task.

    Per-shard FILES are still byte-stable across runs regardless of where
    the sampled boundaries fall: a shard's rows always share one task,
    the task sorts by (shard, pos) — total within the task, so no
    cross-shard tie ambiguity — and the partitionBy writer splits the
    task's ordered stream by shard value. File contents are therefore a
    pure function of the data, not of the boundary sampling.

    Returns the number of shard directories, counted from the windowless
    shard projection (not the driver's local filesystem — ``path`` may be
    any Hadoop filesystem — and not the full manifest, whose row_number
    window would be recomputed just to be counted).

    At 100 TB pick n_shards so a shard is a few GB (thousands of shards,
    one writer task each); readers stream ``shard=i`` dirs independently.
    """
    out = shard_assignments(df, key, n_shards)
    (
        out.repartitionByRange(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_ids(df, key, n_shards).select("shard").distinct().count()
