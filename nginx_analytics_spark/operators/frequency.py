"""Exact distributed heavy hitters — frequent-item detection that never
shuffles the long tail.

The naive exact plan (groupBy(key).count().filter(>= T)) shuffles ONE ROW
PER DISTINCT KEY — at 100 TB of text tokens that is billions of tail keys
crossing the wire to be counted once and discarded. This operator uses
a pigeonhole candidate bound that is PARTITION-COUNT-FREE:

  pass 0  N = df.count()  (scan-count, no key shuffle; metadata-fast on
          an unfiltered Parquet scan), phi = T / N
  pass 1  per-partition exact counts (a dict in Arrow batches, never
          shuffled); a partition of n_p rows emits only keys with local
          count >= phi * n_p  -> candidate superset. Soundness: a key
          with global count >= T = phi * N = phi * sum(n_p) must have
          local count >= phi * n_p in at least one partition (if it were
          below the per-partition quota everywhere, the sum would be
          below T). Holds for ANY partitioning — no partition count
          enters the bound, so there is nothing to estimate and no
          rdd.getNumPartitions() plan conversion (the r3/r4 version
          derived ceil(T/P) from the runtime partition count, which both
          touched the RDD and degenerated to 1 whenever P >= T).
  pass 2  exact counts of the CANDIDATES only: broadcast semi-join
          prunes the scan, then a groupBy whose shuffle carries
          candidates * partitions rows — tail keys never leave their
          partition.

DEGENERATE GUARD: when T is small relative to the data (phi * n_p <= 1
for typical partitions) every distinct key is a candidate and the
broadcast would ship the full distinct-key set through the driver —
inverting the contract and risking driver OOM at exactly the scale this
module targets. So the candidate count is checked (a count() of the
small candidate frame, no collect) and if it exceeds
``max_broadcast_candidates`` the operator falls back to the plain
groupBy/HAVING plan, which is the right plan in that regime anyway
(when most keys are candidates there is no tail to keep home).

The final filter (count >= T) makes the result EXACT and independent of
partitioning (the candidate set varies with the split; the answer does
not — property-tested, and oracle-matched against a plain GROUP BY /
HAVING twin).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many candidates the broadcast semi-join stops being a
# pruning optimization (driver must hold and ship the set) and the plain
# shuffle plan wins. ~1M short keys is a few tens of MB broadcast — a
# comfortable ceiling on a real cluster, generous for tests.
MAX_BROADCAST_CANDIDATES = 1_000_000


def local_candidates(df: DataFrame, key: str, phi: float) -> DataFrame:
    """Per-partition exact counts, emitting keys whose LOCAL count meets
    the fractional pigeonhole quota ``phi * n_p`` of that partition's own
    row count. mapInPandas accumulates across all Arrow batches of a
    partition before emitting — the guarantee needs partition-level
    counts (and the partition's total row count), not batch-level. The
    output schema is derived from the input column's type (any groupable
    key works)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_p = 0
        for b in batches:
            n_p += len(b)
            for k, n in b[key].value_counts().items():
                counts[k] = counts.get(k, 0) + int(n)
        quota = phi * n_p
        keep = [k for k, n in counts.items() if n >= quota]
        yield pd.DataFrame({key: pd.Series(keep, dtype=object)})

    narrowed = df.select(key)
    return narrowed.mapInPandas(summarize, schema=narrowed.schema)


def _plain_heavy(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """The direct GROUP BY / HAVING plan — one row per distinct key over
    the shuffle. Used when the candidate set is too large for the
    broadcast-pruned plan to help (degenerate-guard fallback)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def heavy_hitters(
    df: DataFrame,
    key: str,
    min_count: int,
    max_broadcast_candidates: int = MAX_BROADCAST_CANDIDATES,
) -> DataFrame:
    """Exact NON-NULL keys with global count >= ``min_count``,
    tail-shuffle-free when ``min_count`` is a meaningful fraction of the
    data (module docstring). Output: (key, n) — deterministic regardless
    of input partitioning. NULL keys are excluded up front (pandas
    value_counts drops them and a semi-join never matches NULL; a NULL
    key is not a meaningful hitter — the filter is explicit so the
    contract is too)."""
    df = df.filter(F.col(key).isNotNull())
    total = df.count()
    if total == 0 or min_count <= 1:
        # Empty input, or a threshold that admits every key — the
        # pigeonhole prunes nothing; take the direct plan.
        return _plain_heavy(df, key, min_count)
    phi = min_count / total
    cands = local_candidates(df, key, phi).distinct()
    if cands.count() > max_broadcast_candidates:
        return _plain_heavy(df, key, min_count)
    return (
        df.join(F.broadcast(cands), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


# --------------------------------------------------------------------------
# X68: mergeable count-min frequency sketches
# --------------------------------------------------------------------------
#
# The approximate, MERGEABLE complement to heavy_hitters (exact, whole-
# scan) — the frequency analogue of the per-day HLL distinct rollup
# (aggregates.daily_sketches): store one count-min sketch per day, answer
# ANY date-range "how often did key k appear" with O(days x depth) sketch
# rows and ZERO raw-data access. A CMS is a depth x width counter matrix;
# here it lives in its natural RELATIONAL form — sparse (day, d, col,
# cnt) rows — so building is one groupBy, merging is literally SUM, and
# Spark's columnar machinery does everything (no binary blobs, no UDAF).
# Estimates never undercount (each cell >= the key's true count) and
# overcount by at most the colliding tail: E[error] <= N / width per
# row, min over depth rows (Cormode & Muthukrishnan 2005).

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_cells(key_col: F.Column, depth: int, width: int) -> F.Column:
    """array<struct<d, col>> — the key's cell per hash row. Row d's hash
    is xxhash64(key, d): one 64-bit mix per row, engine-deterministic."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(key_col, F.lit(d)), F.lit(width)).alias("col"),
            )
            for d in range(depth)
        ]
    )


def cms_daily_sketches(
    df: DataFrame,
    ts: str,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One sparse CMS per day: (day, d, col, cnt). The explode fans each
    row to ``depth`` cells INSIDE the scan stage (pipelined, map-side
    partial-aggregated); the exchange carries at most
    days x depth x width pre-aggregated cells — a fixed budget
    independent of row count, the whole point at 100 TB."""
    cells = df.select(
        F.date_trunc("day", F.col(ts)).alias("day"),
        F.explode(_cms_cells(F.col(key), depth, width)).alias("cell"),
    )
    return (
        cells.select("day", "cell.d", "cell.col")
        .groupBy("day", "d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketches: DataFrame,
    probes: DataFrame,
    key: str,
    day_lo: str,
    day_hi: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est) per probe key over [day_lo, day_hi): merge the covered
    daily sketches (SUM per cell — sketches are counters, so union IS
    addition and merged-then-queried == built-over-the-range, property-
    tested), look up each probe's cell per hash row, take the min.
    A probe key never seen in the range estimates 0 via the coalesce.
    The merged sketch is at most depth x width rows — broadcast-sized
    by construction, so probing is a broadcast join however many keys
    are probed."""
    merged = (
        sketches.filter(
            (F.col("day") >= F.lit(day_lo).cast("timestamp"))
            & (F.col("day") < F.lit(day_hi).cast("timestamp"))
        )
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lookups = probes.select(F.col(key)).distinct().select(
        key, F.explode(_cms_cells(F.col(key), depth, width)).alias("cell")
    ).select(key, "cell.d", "cell.col")
    return (
        lookups.join(F.broadcast(merged), ["d", "col"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
