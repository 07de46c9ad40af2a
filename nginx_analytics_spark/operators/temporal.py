"""Temporal join operators — as-of and range joins (SURVEY.md §2.5 class).

Spark has no native ASOF JOIN or interval join; both are staples of log /
time-series analytics ("the user's last purchase at this event", "events
inside each incident window"). Naive formulations are range theta-joins —
Spark plans those as broadcast-nested-loop or cartesian, quadratic at
scale. These implementations re-express them as ONE equi-shuffle each:

  * :func:`asof_join` — union the two sides, one window pass per key in
    event-time order carrying the last right-side payload forward. Cost =
    one hash shuffle on key + one within-partition sort: the sort-merge
    shape, never a cross product, state O(1) per row.
  * :func:`binned_range_join` — quantize time into fixed bins; an interval
    explodes into the bins it overlaps, an event has exactly one bin, so
    (key, bin) equi-join + exact range filter finds every (event,
    interval) pair exactly once (no dedup). Shuffle volume = events +
    intervals x bins_per_interval; bin width trades explode factor
    against join selectivity.

Both have exact cross-engine oracles (DuckDB ASOF JOIN / range theta-join)
— see the registry entries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: tuple[str, ...] = ("value",),
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the payload of the
    LATEST right row with ``right_ts <= left_ts`` for the same key
    (inclusive — ANSI/DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    ``right`` must be unique per (key, right_ts); pre-dedup it (e.g.
    :func:`dedup.exact_dedup`) — as-of over duplicate timestamps is
    ill-defined in every engine. ``tolerance`` (e.g. ``'30 minutes'``)
    drops matches older than ``left_ts - tolerance``, the pandas
    ``merge_asof`` affordance.

    Plan: union sides tagged 0 (right) / 1 (left); window per key ordered
    by (ts, side) — the right row at an equal timestamp sorts first, so it
    IS visible to that left row; ``last(ignorenulls)`` carries the latest
    right ROW forward as one struct; keep left rows. One exchange, one
    sort, no range explosion, O(1) state per row — survives any skew AQE
    can split.

    The carry is a single ``struct(ts, *payload)`` — never per-column:
    per-column ``last(ignorenulls)`` would skip a matched row's NULL
    payload (returning a stale older value where ASOF JOIN semantics
    return the match's NULL), could blend columns from different right
    rows, and would check ``tolerance`` against a timestamp newer than
    the row the payload came from.
    """
    lcols = [c for c in left.columns]
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)

    def q(name: str) -> str:  # backquote DDL field names (spaces, dashes, ...)
        return "`" + name.replace("`", "``") + "`"

    struct_type = (
        "struct<ts:" + rtypes[right_ts]
        + "".join(f",{q(p)}:{rtypes[p]}" for p in payload) + ">"
    )
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        F.lit(None).cast(struct_type).alias("__r"),
    )
    # SQL join semantics: a NULL key never matches (the oracle's equi
    # condition is 3VL-false on NULLs). Window.partitionBy would otherwise
    # group all NULL keys into one partition and carry right payloads onto
    # NULL-key left rows — so drop NULL-key right rows before the union;
    # NULL-key left rows then see only NULL carries and emit NULL payloads.
    r_tagged = right.filter(F.col(key).isNotNull()).select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(f"__l_{c}") for c in lcols],
        F.struct(
            F.col(right_ts).alias("ts"), *[F.col(p) for p in payload]
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__c")
    )
    out = carried.filter(F.col("__side") == 1)
    match = F.col("__c")
    if tolerance is not None:
        expired = match["ts"] < F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        match = F.when(expired, F.lit(None).cast(struct_type)).otherwise(match)
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[match[p].alias(f"asof_{p}") for p in payload],
    )


def bin_of(ts: Column, bin_minutes: int) -> Column:
    """Epoch bin index of a timestamp at the given width."""
    return F.floor(F.unix_timestamp(ts) / (bin_minutes * 60)).cast("bigint")


def binned_range_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bin_minutes: int = 60,
) -> DataFrame:
    """Interval (range) join: pairs (event, interval) with the same key and
    ``start <= ts < end`` — via time-bin bucketing, as one equi-shuffle.

    Every interval explodes into the bins it overlaps; an event has exactly
    ONE bin, so each qualifying pair meets in exactly one (key, bin) bucket
    — no post-join dedup. Pick ``bin_minutes`` near the typical interval
    length: explode factor stays ~2 while the equi-join prunes everything
    beyond one bin of slack. (A naive ``ON key AND ts BETWEEN`` theta-join
    plans as nested-loop — quadratic; this is the scale shape.)

    Returns the joined rows: all event columns + the interval columns.
    """
    e_binned = events.withColumn("__bin", bin_of(F.col(ts), bin_minutes))
    i_binned = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                bin_of(F.col(start), bin_minutes), bin_of(F.col(end), bin_minutes)
            )
        ),
    )
    e, i = e_binned.alias("e"), i_binned.alias("i")
    return (
        e.join(
            i,
            (F.col(f"e.{key}") == F.col(f"i.{key}"))
            & (F.col("e.__bin") == F.col("i.__bin"))
            & (F.col(f"e.{ts}") >= F.col(f"i.{start}"))
            & (F.col(f"e.{ts}") < F.col(f"i.{end}")),
        )
        .select(
            *[F.col(f"e.{c}") for c in events.columns],
            *[F.col(f"i.{c}") for c in intervals.columns if c != key],
        )
    )


def change_periods(
    df: DataFrame,
    key: str,
    order_col: str,
    attr: str,
    tie_break: str | None = None,
) -> DataFrame:
    """SCD-Type-2 derivation (X45): fold a change log into validity
    periods — one row per (key, consecutive-distinct ``attr`` run) with
    ``valid_from`` = first observation and ``valid_to`` = start of the
    next run (NULL for the open period). The standard
    lag-compare → running-sum group → min/lead window pattern, all
    codegen'd; one exchange on the key.

    ``tie_break`` orders simultaneous observations deterministically
    (e.g. an event id); without it equal ``order_col`` values make the
    run assignment nondeterministic.

    Scale: windows partition by the dimension key — high cardinality,
    uniform; the change log is typically tiny next to the fact stream.
    Re-deriving periods from the full log is idempotent (this operator),
    and an INCREMENTAL merge only needs each key's open period plus new
    updates — the same plan over a pruned input.
    """
    from pyspark.sql.window import Window

    order = [F.col(order_col).asc()] + (
        [F.col(tie_break).asc()] if tie_break else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    # Null-safe change predicate: a plain ``lag != attr`` yields NULL when
    # either side is NULL, silently merging a NULL attr into the preceding
    # run (and never opening a new run after one). eqNullSafe treats NULL
    # as a distinct attr value, so NULL runs get their own periods; the
    # first row of a key (lag is NULL, attr non-null) still opens a run.
    chg = F.when(F.lag(attr).over(w).eqNullSafe(F.col(attr)), 0).otherwise(1)
    runs = df.select(
        F.col(key),
        F.col(order_col),
        F.col(attr),
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__run"),
    )
    periods = runs.groupBy(key, "__run").agg(
        F.first(attr).alias(attr), F.min(order_col).alias("valid_from")
    )
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from").asc())
    return periods.select(
        F.col(key),
        F.col(attr),
        F.col("valid_from"),
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
