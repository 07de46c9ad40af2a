"""Sequence packing — concat-and-chunk context-window planning (X34).

LLM pretraining concatenates documents per shard and slices the token
stream into fixed-size context windows. This operator computes that
packing plan declaratively: for each document, which chunk it starts in,
at which offset, and whether it straddles a chunk boundary — the exact
metadata a tokenize-and-pack job needs to write shards without a
sequential driver loop.

Semantics (deterministic): within each partition group (``part_col``),
documents are ordered by ``order_col`` and laid head-to-tail on a token
number line; chunk k covers [k*budget, (k+1)*budget).

    start(d)  = Σ n_tokens of predecessors            (exclusive cumsum)
    chunk_id  = start div budget
    offset    = start mod budget
    spans     = chunk_id(start) != chunk_id(start + n - 1)

Scale notes:
  * One window per PARTITION GROUP (source/shard), not a global order —
    groups pack independently and in parallel, exactly how sharded
    pretraining data is laid out. A single global ordering would funnel
    100 TB through one task; if a global stream is truly required, pack
    per-shard then offset each shard by the (tiny, driver-side) shard
    totals.
  * The cumulative sum is one exchange on ``part_col`` + a running sort
    within partitions — Spark's WindowExec streams it; no Python, no
    state beyond the running counter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_plan(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
    part_col: str,
    order_col: str,
) -> DataFrame:
    """Append (chunk_id, chunk_offset, spans_boundary) packing metadata."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start: Column = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0)).cast("bigint")
    end_incl = start + F.col(n_tokens_col) - 1
    return df.select(
        "*",
        (start % budget).alias("chunk_offset"),
        F.floor(start / budget).alias("chunk_id"),
        (
            (F.col(n_tokens_col) > 0)
            & (F.floor(start / budget) != F.floor(end_incl / budget))
        ).alias("spans_boundary"),
    )


def overlap_chunks(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """X76: split each document into OVERLAPPING token windows — the
    retrieval/context-window preparation twin of the X34 packer (packing
    concatenates documents up to a budget; this fans one document out to
    windows that preserve cross-boundary context). Windows start every
    ``stride = chunk_size - overlap`` tokens; the final window may be
    shorter but always reaches the last token, and a document at or
    under ``chunk_size`` yields exactly one window.

    Output: (id, chunk_idx, n_tokens, chunk_text). Pure Catalyst array
    arithmetic — the token array binds once per row, the explode fans
    out INSIDE the scan stage (pipelined, no shuffle at all), and the
    window count is closed-form: 1 + ceil((n - chunk_size)/stride) for
    n > chunk_size. Deterministic and oracle-expressible (the DuckDB
    twin slices the same windows)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    w = F.split(F.col(text_col), " ")

    def build(toks: Column) -> Column:
        n = F.size(toks)
        k = F.lit(1) + F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((n - F.lit(chunk_size) + F.lit(stride - 1)) / F.lit(stride)),
        )
        return F.transform(
            F.sequence(F.lit(0).cast("bigint"), k - 1),
            lambda i: F.struct(
                i.alias("chunk_idx"),
                F.slice(toks, i * stride + 1, chunk_size).alias("toks"),
            ),
        )

    # bind the token array once per row (the word_shingles let-binding trick)
    chunks = F.element_at(F.transform(F.array(w), build), 1)
    return (
        docs.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.toks").cast("bigint").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )
