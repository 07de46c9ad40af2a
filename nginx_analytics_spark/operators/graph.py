"""Distributed connected components — dedup cluster resolution.

Near-dup detection (dedup.py, similarity.py) emits PAIRS; an actual
dedup pass needs CLUSTERS: the transitive closure of the pair relation,
one survivor per component. The reference has no notion of this (its
dedup surface stops at at-least-once delivery, SURVEY.md §2.5); every
real corpus pipeline needs it, so it is part of the engine's §2.9
extension surface (X30).

Algorithm: iterative min-label propagation with pointer jumping —
each node's label starts as its own id; every round takes

    label(v) <- min(label(v), min_{(u,v) in E} label(u))   (hash join + agg)
    label(v) <- label(label(v))                            (pointer jump)

Plain propagation alone needs O(diameter) rounds; the pointer-jump step
(labels are node ids, so they can be re-resolved against the label
frame) halves remaining chain lengths each round, giving O(log d)
convergence — the standard Hash-to-Min shape (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013).

Scale notes (100 TB):
  * Per round: ONE fused plan (neighbor join + min agg + merge + jump,
    all against the previous round's materialized labels) ending in a
    single localCheckpoint — all codegen'd; rounds are O(log d) and
    near-dup graphs have tiny diameters in practice (dup clusters are
    dense), so 3-5 rounds is typical.
  * Labels are eagerly localCheckpoint'd each round: the loop would
    otherwise stack lineage (round i re-executes rounds 0..i-1, the
    O(n^2) re-execution trap behavior.py documents for funnels). On a
    cluster where executor loss must be survivable, swap for
    ``checkpoint()`` to a reliable store.
  * The convergence probe is a joinless filter+count over the round's
    checkpointed frame (a per-row changed flag computed in-plan) —
    O(#nodes) with map-side combine, no driver data.
  * Only node ids ride the loop; payload columns join back once at the
    end. Edges for dedup are near-dup pairs — |E| << corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; the component id is
    the MINIMUM node id in the component — deterministic, so the result
    is oracle-comparable against a recursive-CTE transitive closure.

    ``edges`` is treated as undirected; self-loops and duplicates are
    harmless (they union into the same min-aggregation).
    """
    sym = edges.select(
        F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
    )
    # Materialize the symmetric edge frame ONCE: every round's neighbor
    # join consumes it, and `edges` is typically the output of an entire
    # near-dup pipeline — without this, round i re-executes that whole
    # upstream DAG (observed: the exact-Jaccard plan re-ran per round,
    # tripling the operator's cost).
    sym = sym.unionByName(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_rounds):
        # One fused plan per round — neighbor-min, merge with own label,
        # and pointer jump all resolve against the PREVIOUS round's
        # checkpointed label frame, so the round materializes exactly one
        # frame (it previously checkpointed twice and ran a third
        # join+count job for the convergence probe). Jumping through the
        # stale frame is a slightly weaker contraction than jumping
        # through the merged one, but the fixpoint is the same (the
        # unique fixpoint of min-propagation: comp stable under
        # neighbor-min implies comp constant per component, and comp is
        # always >= the component min it started from), and convergence
        # stays O(log diameter).
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("v"), "comp"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("nmin"))
        )
        jump = labels.select(
            F.col("node").alias("c_node"), F.col("comp").alias("c_comp")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("comp").alias("__prev"),
                F.least("comp", F.coalesce("nmin", "comp")).alias("__m"),
            )
            # comp <- comp(comp): labels are node ids, so every merged
            # value resolves against the label frame (left + coalesce
            # guards fixpoint rows where comp == node already).
            .join(jump, F.col("__m") == F.col("c_node"), "left")
            .select(
                "node",
                "__prev",
                F.least("__m", F.coalesce("c_comp", "__m")).alias("comp"),
            )
            .select(
                "node", "comp", (F.col("comp") != F.col("__prev")).alias("__ch")
            )
            .localCheckpoint(eager=True)
        )
        # Convergence witness rides the materialized frame: a filter +
        # count over the checkpoint, no joins, no extra lineage. (A
        # label-SUM probe is one scan cheaper still but can in principle
        # alias through 64-bit overflow on very large id spaces; the
        # count cannot.)
        n_changed = new_labels.filter(F.col("__ch")).count()
        labels = new_labels.select("node", "comp")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach a fixpoint in {max_rounds} "
            "rounds — labels would be silently incomplete; raise max_rounds "
            "(pointer jumping converges in O(log diameter) rounds)"
        )
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Resolve near-dup PAIRS into per-document cluster assignments.

    Output: (id_col, cluster_id, is_duplicate) for EVERY document —
    unpaired docs are their own singleton cluster; ``is_duplicate`` marks
    the rows a dedup pass would drop (everything but the min-id survivor
    of each cluster). ``docs.filter(~is_duplicate)`` IS the deduped
    corpus, and the whole assignment writes out in one pass.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    out = docs.select(id_col).join(
        comp.select(F.col("node").alias(id_col), "component"), id_col, "left"
    )
    cluster = F.coalesce("component", F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster != F.col(id_col)).alias("is_duplicate"),
    )


def quality_survivors(
    assign: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "quality",
) -> DataFrame:
    """X100: QUALITY-AWARE survivor selection — production curation
    keeps the BEST-QUALITY member of each near-dup cluster, not the
    min-id one (the replicas of a page differ in boilerplate, OCR
    noise, truncation; min-id keeps whichever crawl landed first).
    Composes the engine's existing pieces: ``assign`` is
    :func:`dedup_clusters`'s (id, cluster_id) output (X30), ``quality``
    any per-doc score frame — the X26 rubric or the X81 calibrated
    classifier probability.

    Survivor per cluster = argmax(quality), ties broken by MIN id
    (deterministic, partition-invariant, and equal to the min-id
    survivor wherever quality does not discriminate — so this is a
    strict refinement of :func:`dedup_clusters`' drop rule). Returns
    (id, cluster_id, quality, is_duplicate) for every assigned doc;
    ``filter(~is_duplicate)`` is the curated corpus.

    Scale shape: one id-keyed join, then ONE combine-friendly
    max-of-struct aggregation per cluster — (quality, -id) so max
    realizes argmax-with-min-id-ties — broadcast-or-shuffle joined
    back on the cluster key. No window over a hot cluster key: the
    boilerplate mega-cluster that makes window-ranking skew-bound is
    exactly where a partial-aggregating max stays flat. (Ids are
    nonnegative by the module's convention; the negation tie-break
    would overflow only on LONG_MIN ids.)

    Reference: none — the reference has no corpus pipeline; the
    keep-best-quality rule is the published curation standard (e.g.
    Gopher/MassiveText and RefinedWeb keep highest-quality replicas
    after fuzzy dedup)."""
    j = assign.select(F.col(id_col), F.col(cluster_col)).join(
        quality.select(F.col(id_col), F.col(quality_col)), id_col
    )
    best = (
        j.groupBy(cluster_col)
        .agg(
            F.max(
                F.struct(
                    F.col(quality_col).alias("q"),
                    (-F.col(id_col)).alias("negid"),
                )
            ).alias("__b")
        )
        .select(cluster_col, (-F.col("__b.negid")).alias("__surv"))
    )
    return j.join(best, cluster_col).select(
        F.col(id_col),
        F.col(cluster_col),
        F.col(quality_col),
        (F.col(id_col) != F.col("__surv")).alias("is_duplicate"),
    )
