"""X85: streaming EMBEDDING ingest with incremental semantic near-dedup
— the X84 probe and the SRP index append composed inside
``foreachBatch``; the embedding-modality twin of the X80 text loop
(:mod:`~nginx_analytics_spark.streaming.dedup_ingest`, whose module
docstring carries the full delivery-semantics and single-writer
rationale — everything there applies verbatim here, with
``(vec_id, embedding)`` in place of ``(doc_id, text)`` and cosine in
place of Jaccard):

  for each micro-batch of embedding rows:
    1. exact-dedup WITHIN the batch (bit-identical vectors; the vector
       array itself is the group key — deterministic min-id survivor);
    2. near-dedup WITHIN the batch (SRP-LSH bucket pairs + blocked
       Arrow cosine verify at the production threshold —
       ``similarity.hyperplane_lsh_pairs``; the GREATER id of each
       passing pair is dropped, the standard greedy pass);
    3. near-dedup AGAINST THE CORPUS via the at-rest SRP index
       (``similarity.incremental_embedding_near_dups``, pure probe:
       sign the batch only, band-join the index, Arrow-cosine-verify
       collisions with corpus vectors semi-join-pruned to them);
    4. append the surviving NOVEL rows to the corpus store and their
       band keys to the index (``similarity.append_srp_index``), so
       the NEXT batch dedups against them too.

Per-batch cost scales with the batch and its collision volume, never
the corpus. ``exactly_once=True`` composes the X73 per-batch-directory
overwrite for the corpus store; the index append stays at-least-once
by the same argument as the text loop (replayed band keys are
collapsed by the probe's candidate ``distinct()``). ``compact_every=N``
folds the shared X82 per-band compaction into the loop (the SRP index
reuses the text index's at-rest banded format and compactor wholesale
— r12 lineage: X82 → ``similarity.compact_srp_index``). Single-writer
enforcement is the SAME code as the text loop
(:func:`~nginx_analytics_spark.streaming.dedup_ingest._enter_index_mutex`):
each micro-batch holds the index's sibling compact-lock across heal +
probe + append + bootstrap + compaction, and the
``jobs embedding-dedup-ingest`` CLI holds it for the stream's whole
lifetime. The corpus store's file growth is bounded offline by the
shared X87 compactor (``dedup_ingest.compact_corpus`` / ``jobs
compact-corpus``) under the same mutex.

The reference has no embedding pipeline at all (SURVEY.md §2.9 X84/X85
extension surface); this is the semantic-dedup ingest gate a 100 TB
multimodal training-data deployment runs continuously.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nginx_analytics_spark.operators import dedup, similarity
from nginx_analytics_spark.streaming.dedup_ingest import (
    _enter_index_mutex,
    read_corpus,
)


def dedup_embedding_batch_against_corpus(
    spark: SparkSession,
    batch: DataFrame,
    corpus_dir: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    fs=None,
    return_keys: bool = False,
) -> DataFrame:
    """Steps 1-3 for one batch: returns the NOVEL rows (same schema as
    ``batch``). Pure function over (batch, at-rest state) — the
    foreachBatch handler below adds the writes. The default threshold
    is 0.85, the regime embedding dup detection actually operates in
    (hyperplane_lsh_pairs' selectivity note) — near-identical vectors,
    not the fixture's hard 0.4 recall-stress setting; callers pass the
    production value for their embedding space.

    Sign once (r16, guide §1.2): the batch's SRP band keys are
    materialized ONCE here and shared by the against-corpus probe;
    ``return_keys=True`` returns ``(novel, keys)`` so the loop hands
    the novel subset to the index append/bootstrap too — previously
    the probe and the append each re-ran the signing matmul over the
    same rows. (The within-batch pair pass keeps its own banding: it
    needs the vectors alongside the keys for the in-bucket BLAS
    verify, a different row shape.)"""
    from nginx_analytics_spark.operators.index_fs import LOCAL_FS

    fs = fs or LOCAL_FS
    sc = spark.sparkContext
    sc.setJobDescription("X85: dedup batch")
    b = dedup.exact_dedup(
        batch, keys=[vec_col], order_col=id_col
    ).localCheckpoint(eager=True)  # consumed by pairs + anti-joins

    # the ONE signing of this batch: (id, band_idx, band_hash), shared
    # by the probe's band join and the loop's index append
    sc.setJobDescription("X85: sign batch")
    keys = similarity.srp_band_keys(
        b, id_col, vec_col, n_planes, bands, dim, seed
    ).localCheckpoint(eager=True)
    sc.setJobDescription(None)

    # within-batch near-dups: drop the greater id of each passing pair
    pairs = similarity.hyperplane_lsh_pairs(
        b, threshold=threshold, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, bands=bands, dim=dim, seed=seed,
    )
    # loser/dup id sets are batch-bounded: broadcast anti-joins keep the
    # survivor frame on the stream side with no exchange; no .distinct()
    # — the anti-join ignores duplicate keys and the dedup was one more
    # shuffle + job per batch (r17)
    losers = pairs.select(F.col("id_b").alias(id_col))
    b = b.join(F.broadcast(losers), id_col, "left_anti")

    if fs.isfile(similarity.srp_index_meta_path(index_path)):
        sc.setJobDescription("X85: probe at-rest index")
        corpus = read_corpus(spark, corpus_dir)
        hits = similarity.incremental_embedding_near_dups(
            spark, b, corpus, index_path,
            threshold=threshold, id_col=id_col, vec_col=vec_col,
            n_planes=n_planes, bands=bands, dim=dim, seed=seed, fs=fs,
            new_keys=keys,
        )
        sc.setJobDescription(None)
        dup_ids = hits.select(F.col("new_id").alias(id_col))
        b = b.join(F.broadcast(dup_ids), id_col, "left_anti")
    return (b, keys) if return_keys else b


def process_embedding_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    exactly_once: bool = False,
    compact_every: int | None = None,
    max_files_per_band: int = dedup.COMPACT_MAX_FILES_PER_BAND,
    fs=None,
    lock_held: bool = False,
    lock_timeout_s: float = 0.0,
    telemetry: dict | None = None,
) -> tuple[int, int]:
    """One micro-batch of the X85 loop (exposed for retry tests and
    batch backfills): dedup, admit, append. Returns (n_in, n_novel).
    Contract is the text loop's
    (:func:`~nginx_analytics_spark.streaming.dedup_ingest.process_batch`
    — exactly-once corpus landing, index-state-driven compaction
    cadence, verified single-writer mutex held for the WHOLE batch,
    ``lock_wait_s`` telemetry), with the SRP signing parameters in
    place of the MinHash ones: the sidecar pins (n_planes, bands, dim,
    seed), so a config change between deployments fails loudly in the
    probe/append instead of silently losing recall."""
    import os
    from contextlib import ExitStack

    from nginx_analytics_spark.operators.index_fs import LOCAL_FS

    fs = fs or LOCAL_FS
    stack = ExitStack()
    _enter_index_mutex(
        stack, fs, index_path,
        lock_held=lock_held, lock_timeout_s=lock_timeout_s,
        telemetry=telemetry,
    )
    srp_kw = dict(
        id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, bands=bands, dim=dim, seed=seed, fs=fs,
    )
    with stack:
        if fs.isfile(similarity.srp_index_meta_path(index_path)):
            # heal a compaction interrupted by a crash BEFORE probing —
            # the recovery body is modality-agnostic (band dirs only),
            # shared with the text index. The mutex is held above.
            dedup._recover_lsh_compaction_locked(index_path, fs)
        # one count() both empties-gates and feeds telemetry (the prior
        # head(1) + count() pair scanned the micro-batch source twice)
        sc = spark.sparkContext
        sc.setJobDescription("X85: source count")
        n_in = batch.count()
        sc.setJobDescription(None)
        n_novel = 0
        if n_in:
            novel, keys = dedup_embedding_batch_against_corpus(
                spark, batch, corpus_dir, index_path,
                id_col=id_col, vec_col=vec_col, threshold=threshold,
                n_planes=n_planes, bands=bands, dim=dim, seed=seed,
                fs=fs, return_keys=True,
            )
            sc.setJobDescription("X85: novel materialize")
            novel = novel.localCheckpoint(eager=True)  # write + append
            n_novel = novel.count()
            sc.setJobDescription(None)
        if n_novel:
            # Overlap the two independent writes over the checkpointed
            # novel frame (guide §2.6) — crash-order analysis on the
            # text loop's process_batch applies verbatim (index-ahead
            # leaves benign orphans, corpus-ahead the repairable
            # missing-from-index direction; at-least-once either way).
            def _corpus_write() -> None:
                sc.setJobDescription("X85: corpus write")  # thread-local
                if exactly_once:
                    dest = os.path.join(
                        corpus_dir, f"ingest_batch={batch_id}"
                    )
                    novel.write.mode("overwrite").parquet(dest)
                else:
                    novel.write.mode("append").parquet(corpus_dir)

            def _index_append() -> None:
                # the batch was signed exactly once; the index append/
                # bootstrap reuses the novel subset of those keys
                # (novel ids are batch-bounded — broadcast the semi-join)
                sc.setJobDescription("X85: index append")
                novel_keys = keys.join(
                    F.broadcast(novel.select(id_col)), id_col, "left_semi"
                )
                if fs.isfile(similarity.srp_index_meta_path(index_path)):
                    similarity.append_srp_index(
                        novel, index_path, keys=novel_keys, **srp_kw
                    )
                else:
                    similarity.write_srp_index(
                        novel, index_path, keys=novel_keys, **srp_kw
                    )

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [
                    pool.submit(_corpus_write),
                    pool.submit(_index_append),
                ]
                for f in futs:
                    f.result()  # propagate either failure -> batch retry
        if (
            compact_every
            and (batch_id + 1) % compact_every == 0
            and fs.isfile(similarity.srp_index_meta_path(index_path))
        ):
            dedup._compact_lsh_index_locked(
                spark, index_path,
                max_files_per_band=max_files_per_band, fs=fs,
            )
    return (n_in, n_novel)


def start_embedding_dedup_ingest(
    emb_stream: DataFrame,
    corpus_dir: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    trigger: dict | None = None,
    exactly_once: bool = False,
    compact_every: int | None = None,
    max_files_per_band: int = dedup.COMPACT_MAX_FILES_PER_BAND,
    on_batch: Callable[[int, int, int, float], None] | None = None,
    fs=None,
    lock_held: bool = False,
    lock_timeout_s: float = 0.0,
) -> StreamingQuery:
    """Run the continuous semantic dedup-ingest loop over a streaming
    DataFrame of embedding rows — the X80 entry point for the
    embedding modality. ``on_batch(batch_id, n_in, n_novel,
    lock_wait_s)`` surfaces the same admission + mutex-wait telemetry
    as the text loop (a sudden novel-rate collapse means upstream
    re-delivery; a 100% novel rate on a known-overlapping feed means
    the index is being missed)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        tele: dict = {}
        n_in, n_novel = process_embedding_batch(
            batch.sparkSession, batch, batch_id, corpus_dir, index_path,
            id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_planes=n_planes, bands=bands, dim=dim, seed=seed,
            exactly_once=exactly_once, compact_every=compact_every,
            max_files_per_band=max_files_per_band, fs=fs,
            lock_held=lock_held, lock_timeout_s=lock_timeout_s,
            telemetry=tele,
        )
        if on_batch is not None:
            on_batch(batch_id, n_in, n_novel, tele.get("lock_wait_s", 0.0))

    writer = (
        emb_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
