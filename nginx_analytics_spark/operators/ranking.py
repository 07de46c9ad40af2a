"""Ranking / top-k operators (SURVEY.md §2.5 gap-fill, §7 M6).

The reference has no ranking window functions; these are the natural
next queries over a log fact table (top URIs per endpoint, heaviest IPs).
Window row_number with a deterministic tiebreak keeps results stable.

Scale note: row_number over (partition by k order by v) shuffles once on k
and sorts within partitions — for top-k with small k over huge groups,
prefer :func:`topk_per_key_agg` which computes a bounded per-group heap via
partial aggregation (max_by/slice), avoiding the full in-group sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Classic windowed top-k: row_number() over
    (PARTITION BY key ORDER BY order_col [DESC], tiebreak) <= k."""
    ordering = (
        [F.col(order_col).desc(), F.col(tiebreak).asc()]
        if descending
        else [F.col(order_col).asc(), F.col(tiebreak).asc()]
    )
    w = Window.partitionBy(key).orderBy(*ordering)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def topk_per_key_agg(
    df: DataFrame, key: str, order_col: str, tiebreak: str, k: int
) -> DataFrame:
    """Shuffle-light top-k (descending): collect a bounded sorted slice per
    group via aggregation. Partial aggregation truncates to k map-side, so
    the shuffle carries at most k rows per (key, partition) instead of the
    whole group — the shape that survives 100 TB groups.

    Returns (key, rn, order_col, tiebreak) exploded back to rows.
    """
    pair = F.struct(
        F.col(order_col).alias("v"), F.col(tiebreak).alias("t")
    )
    # sort_array on (desc v, asc t): sort ascending on (-v, t).
    neg = F.struct((-F.col(order_col)).alias("nv"), F.col(tiebreak).alias("t"), pair.alias("p"))
    agg = (
        df.groupBy(key)
        .agg(F.slice(F.array_sort(F.collect_list(neg)), 1, k).alias("top"))
    )
    exploded = agg.select(
        key, F.posexplode("top").alias("pos", "item")
    )
    return exploded.select(
        key,
        (F.col("pos") + 1).alias("rn"),
        F.col("item.p.v").alias(order_col),
        F.col("item.p.t").alias(tiebreak),
    )
