"""Skew-resistant aggregation — salting (SURVEY.md §4 partitioning notes).

Per-key log aggregations (requests per IP, per endpoint) are exactly the
shape that dies on hot keys at 100 TB: one reducer gets the botnet IP.
AQE's skew-join splitting handles joins, but a skewed *aggregation* needs
either partial aggregation (Spark does map-side combine automatically —
usually enough) or explicit salting when the combine ratio is poor (e.g.,
high-cardinality composite values under the hot key).

:func:`salted_key_stats` demonstrates the two-phase pattern for COUNT/AVG:

  phase 1: groupBy(key, salt) — the hot key fans out over ``salt_buckets``
           reducers, each emitting (count, sum) partials;
  phase 2: groupBy(key) — combines ``salt_buckets`` partial rows per key.

The decomposition is algebraic (count = Σcount_i, avg = Σsum_i/Σcount_i),
so results are IDENTICAL to the plain groupBy — which is what the oracle
checks. Salt is ``pmod(xxhash64(monotonically_increasing_id()), buckets)``:
deterministic per row position, uniform, and independent of the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.functions.rounding import half_up

SALT_BUCKETS = 16


def salted_key_stats(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = SALT_BUCKETS,
    round_to: int | None = 6,
) -> DataFrame:
    """Two-phase salted count+avg per key; result identical to
    ``groupBy(key).agg(count, avg)`` (see module docstring).

    Note the avg is recomposed from (Σsum, Σcount) — summing partial sums,
    never averaging partial averages. The measure column's type is kept
    as-is: with an integral measure the recomposition is bit-deterministic
    (integer sums commute); with doubles it is correct up to float
    summation order, like any distributed sum.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(F.col(key), F.col("_salt"))
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(value).alias("_sum"),
        )
    )
    mean = F.sum("_sum") / F.sum("_cnt")
    if round_to is not None:
        mean = half_up(mean, round_to)
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("request_count"),
        mean.alias("avg_request_time"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side salts each row into one of
    ``salt_buckets`` sub-keys; the small side REPLICATES once per salt.
    The join runs on (key, salt), so a hot key's rows spread over
    ``salt_buckets`` reducers instead of serializing on one.

    Result is IDENTICAL to ``big.join(small, key, how)`` for inner/left
    joins with a unique-keyed small side — each big row meets exactly
    the one replica carrying its salt (the oracle checks equality).

    When to use over AQE skew-join splitting: AQE can only split a
    sort-merge join's oversized partitions AFTER a full shuffle of both
    sides materializes; manual salting never creates the hot partition
    in the first place, works for broadcast-ineligible small sides, and
    composes with bucketed layouts. Cost: small side × salt_buckets
    replication — keep buckets at the skew factor, not higher.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    replicas = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return big_s.join(replicas, [key, "_salt"], how).drop("_salt")
