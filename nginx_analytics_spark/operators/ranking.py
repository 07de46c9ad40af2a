"""Ranking / top-k operators (SURVEY.md §2.5 gap-fill, §7 M6).

The reference has no ranking window functions; these are the natural
next queries over a log fact table (top URIs per endpoint, heaviest IPs).
Window row_number with a deterministic tiebreak keeps results stable.

Scale note: row_number over (partition by k order by v) shuffles the WHOLE
table once on k and sorts within partitions. For top-k with small k over
huge/skewed groups, :func:`topk_per_key_bounded` truncates to k rows per
(key, input-partition) BEFORE the exchange, so the shuffle moves at most
k x n_partitions rows per key regardless of group size. (A collect_list +
slice aggregation does NOT achieve this: Spark's partial aggregation
accumulates the entire per-partition group into the array and the slice
runs only after the final merge, so the full group rides the shuffle.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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


def partition_topk(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Truncate each input partition to its local top-k rows per key,
    BEFORE any exchange (an Arrow-batched mapInPandas narrow map).

    Correctness invariant: every row in the global top-k of a key is in the
    top-k of whatever partition (and Arrow batch) it sits in, so per-batch
    truncation keeps a superset of the answer. Arrow may split a partition
    into multiple batches (spark.sql.execution.arrow.maxRecordsPerBatch),
    which only loosens the bound: the survivor count per key is at most
    k x n_batches, never fewer than the true top-k.
    """
    # Match Spark's window NULL ordering per column, or truncation breaks
    # the superset invariant: asc sorts NULLS FIRST, desc NULLS LAST — and
    # pandas applies ONE na_position to every sort column, so a combined
    # sort_values([order, tiebreak]) cannot express (desc NULLS LAST,
    # asc NULLS FIRST). Two stable passes give each column its own rule.
    #
    # Domain limit (documented, not silently wrong): float columns holding
    # REAL NaN are outside this kernel — Arrow conflates NaN with NULL in
    # pandas float64, so Spark's NaN ordering (greater than every value,
    # distinct from NULL) cannot be reproduced; use plain topk_per_key for
    # NaN-bearing data.
    o_asc = not descending
    o_na = "first" if o_asc else "last"

    def trunc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.sort_values(
                tiebreak, ascending=True, kind="mergesort", na_position="first"
            )
            pdf = pdf.sort_values(
                order_col, ascending=o_asc, kind="mergesort", na_position=o_na
            )
            yield (
                # dropna=False: a NULL key is its own window partition in
                # Spark — pandas' default would silently drop the group.
                pdf.groupby(key, sort=False, dropna=False).head(k)
            )

    return df.mapInPandas(trunc, df.schema)


def topk_per_key_bounded(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Two-phase top-k for huge/skewed groups: per-partition truncation
    (:func:`partition_topk`) then the windowed top-k over survivors.

    The exchange before the window moves at most k x n_batches rows per key
    instead of the whole group — the shape that survives 100 TB groups where
    a single hot key holds billions of rows. For small inputs prefer the
    plain :func:`topk_per_key` (one stage fewer, no Arrow hop).
    """
    pruned = partition_topk(df, key, order_col, tiebreak, k, descending)
    return topk_per_key(pruned, key, order_col, tiebreak, k, descending)
