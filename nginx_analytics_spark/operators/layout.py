"""Z-order (Morton) at-rest layout — multi-column row-group pruning.

Sorting a table by ONE column makes Parquet min/max stats surgical for
that column and useless for every other (warehouse.append_raw_logs sorts
by remote_addr; a timestamp point-read still scans every row group).
Interleaving the bits of TWO normalized sort keys gives a curve where
runs of consecutive rows are compact in BOTH dimensions — each row group
covers a small rectangle of (a, b) space, so min/max stats prune
selective predicates on EITHER column.

This is the standard data-clustering technique of lakehouse table
formats (Delta OPTIMIZE ZORDER BY, Iceberg sort orders), implemented
here as pure Catalyst column arithmetic:

  scale:      rank-normalize each key to [0, 2^bits) with min/max from a
              1-row broadcast aggregate (one light pass; at 100 TB use
              approx quantile bounds the same way)
  interleave: z = Σ_i ((a_i << 2i) | (b_i << 2i+1)) — 2*bits shift/mask
              terms, folded by whole-stage codegen, no UDF
  layout:     repartitionByRange(z) + sortWithinPartitions(z) so files
              AND row groups tile the curve

Pruning effectiveness is asserted from the real Parquet footers in
tests/test_layout.py: under a Z-order layout, a mid-range point band on
EACH dimension overlaps a small fraction of row groups, where the
single-column-sorted layout prunes only its sort column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # 2 x 16 interleaved bits -> z fits comfortably in int64


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to integer [0, 2^bits - 1].
    Degenerate (lo == hi) columns collapse to 0 — constant keys carry no
    pruning information anyway."""
    top = F.lit((1 << bits) - 1)
    span = F.nullif(hi.cast("double") - lo.cast("double"), F.lit(0.0))
    frac = (col.cast("double") - lo.cast("double")) / span
    return F.coalesce(
        F.least(F.floor(frac * (top + F.lit(1))), top), F.lit(0)
    ).cast("bigint")


def zvalue(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two pre-scaled non-negative integer columns."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` Z-ordered on (col_a, col_b): range-partitioned and
    sorted by the interleaved key, so both files and row groups tile the
    curve. One light min/max pass (broadcast 1-row frame), one range
    exchange — the same cost as a plain global sort, but the stats it
    buys prune two dimensions instead of one."""
    bounds = df.agg(
        F.min(col_a).alias("_a_lo"),
        F.max(col_a).alias("_a_hi"),
        F.min(col_b).alias("_b_lo"),
        F.max(col_b).alias("_b_hi"),
    )
    with_z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        zvalue(
            _scale_to_bits(F.col(col_a), F.col("_a_lo"), F.col("_a_hi"), bits),
            _scale_to_bits(F.col(col_b), F.col("_b_lo"), F.col("_b_hi"), bits),
            bits,
        ),
    )
    (
        with_z.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", "_a_lo", "_a_hi", "_b_lo", "_b_hi")
        .write.mode("overwrite")
        .parquet(path)
    )
