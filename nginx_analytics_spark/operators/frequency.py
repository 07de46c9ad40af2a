"""Exact distributed heavy hitters — frequent-item detection that never
shuffles the long tail.

The naive exact plan (groupBy(key).count().filter(>= T)) shuffles ONE ROW
PER DISTINCT KEY — at 100 TB of text tokens that is billions of tail keys
crossing the wire to be counted once and discarded. This operator uses
the pigeonhole candidate bound of distributed Misra-Gries style
summaries: a key with global count >= T must have local count >= T/P in
at least one of P partitions. So:

  pass 1  per-partition exact counts (a dict in Arrow batches, never
          shuffled), emit only keys with local count >= ceil(T/P)
          -> candidate superset, size bounded by P * (N_p / (T/P)) keys
  pass 2  exact counts of the CANDIDATES only: broadcast semi-join
          prunes the scan, then a groupBy whose shuffle carries
          candidates * partitions rows — tail keys never leave their
          partition.

The final filter (count >= T) makes the result EXACT and independent of
partitioning (the candidate set varies with the split; the answer does
not — property-tested, and oracle-matched against a plain GROUP BY /
HAVING twin).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def local_candidates(df: DataFrame, key: str, local_threshold: int) -> DataFrame:
    """Per-partition exact counts, emitting keys whose LOCAL count meets
    the pigeonhole threshold. mapInPandas accumulates across all Arrow
    batches of a partition before emitting — the guarantee needs
    partition-level counts, not batch-level. The output schema is
    derived from the input column's type (any groupable key works)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for b in batches:
            for k, n in b[key].value_counts().items():
                counts[k] = counts.get(k, 0) + int(n)
        keep = [k for k, n in counts.items() if n >= local_threshold]
        yield pd.DataFrame({key: pd.Series(keep, dtype=object)})

    narrowed = df.select(key)
    return narrowed.mapInPandas(summarize, schema=narrowed.schema)


def heavy_hitters(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Exact NON-NULL keys with global count >= ``min_count``,
    tail-shuffle-free (module docstring). Output: (key, n) —
    deterministic regardless of input partitioning. NULL keys are
    excluded up front (pandas value_counts drops them and a semi-join
    never matches NULL; a NULL key is not a meaningful hitter — filter
    is explicit so the contract is too)."""
    df = df.filter(F.col(key).isNotNull())
    p = max(1, df.rdd.getNumPartitions())
    local_t = max(1, math.ceil(min_count / p))
    cands = local_candidates(df, key, local_t).distinct()
    return (
        df.join(F.broadcast(cands), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
