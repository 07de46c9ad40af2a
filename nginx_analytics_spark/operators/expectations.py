"""X70: declarative data-quality expectation checks.

A production pipeline gates every table hand-off on invariants —
uniqueness of keys, null-freedom, value ranges, referential integrity
(the role Deequ/Great Expectations play around Spark). Here the checks
are plain Catalyst aggregates so the gate costs what a single scan
costs:

  * all SINGLE-TABLE rules evaluate in ONE aggregation pass — each rule
    is a conditional-count expression, so N rules share one scan and
    one (1-row) aggregate, then unpivot to (rule, violations) rows;
  * referential rules are LEFT ANTI joins (orphan counts) unioned in —
    one extra pass per foreign table, with the parent side reduced to
    its distinct key before the join.

Violation COUNTS, not booleans, are the output contract: a gate flips
on ``violations > 0``, but the count is what an operator pages on and
what a trend monitor stores. At 100 TB the single-pass property is the
whole point — expectation suites that scan once per rule re-read the
corpus N times.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations_if(cond: Column) -> Column:
    """Aggregate counting rows where ``cond`` holds (NULL-safe: a NULL
    condition — e.g. a comparison on a NULL value — counts as a
    violation only if the rule says so explicitly via isNull)."""
    return F.sum(
        F.when(cond, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")


def not_null(col: str) -> Column:
    """Rule: ``col`` must never be NULL."""
    return violations_if(F.col(col).isNull())


def within(col: str, lo, hi) -> Column:
    """Rule: non-NULL ``col`` must lie in [lo, hi]."""
    c = F.col(col)
    return violations_if(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def unique(*cols: str) -> Column:
    """Rule: (cols) must be unique — violations = rows beyond the first
    per key = count(*) - count(distinct struct(cols)).

    The key is STRUCT-WRAPPED so NULLs compare as values (r5 ADVICE): a
    bare multi-column count_distinct drops any row where ANY key column
    is NULL, which reported every NULL-containing row as a duplicate —
    conflating null-freedom (not_null's job) with duplication. Here two
    (1, NULL) rows are one duplicate, and a single (1, NULL) row is no
    violation at all. SQL twin: ``count(DISTINCT (c1, c2))`` (row-value
    distinct treats NULL fields as values in ANSI engines too); for an
    all-non-NULL key — e.g. a primary-key check — this is identical to
    the bare form. Distinct-agg expands to Spark's standard two-phase
    plan inside the same aggregate."""
    return (
        F.count(F.lit(1))
        - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
    ).cast("bigint")


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate all single-table rules in ONE pass over ``df``.
    Returns (rule, violations, passed) rows, one per rule."""
    row = df.agg(*[expr.alias(name) for name, expr in rules.items()])
    branches = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(name).alias("violations"),
        )
        for name in rules
    ]
    return (
        row.select(F.explode(F.array(*branches)).alias("r"))
        .select("r.rule", "r.violations")
        .withColumn("passed", F.col("violations") == 0)
    )


def check_reference(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule: str,
) -> DataFrame:
    """Referential-integrity rule: every non-NULL ``child_key`` must
    exist in ``parent_key`` — violations = orphan rows via LEFT ANTI
    against the parent's distinct key (reduced before the join so the
    probe side is as small as the key domain)."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(keys, child_key, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
    )
    return orphans.select(
        F.lit(rule).alias("rule"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def suite(parts: list[DataFrame]) -> DataFrame:
    """Union the per-table/per-reference check frames into one report."""
    return reduce(lambda a, b: a.unionByName(b), parts)
