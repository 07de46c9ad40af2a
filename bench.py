#!/usr/bin/env python
"""Headline benchmark — the driver's per-round BENCH_r{N}.json feed.

Runs the engine's representative query set at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology:
  * Each query executes end-to-end into a ``noop`` sink — full computation,
    no driver collection and no disk-write cost in the measurement.
  * One untimed warmup query first amortizes JVM/codegen startup, and each
    query reports the BEST OF 2 back-to-back runs: the numbers measure
    steady-state engine throughput. (First-run times for expression-heavy
    queries include HotSpot compiling/inlining their interpreter paths,
    which in a long session with hundreds of loaded expression classes is
    a JVM artifact that varies 5-25x run to run, not a plan cost.)
  * The set spans the reference surface (parse/enrich, aggregations, the
    z-score anomaly chain, feature projections, top-k windows) plus the
    corpus operators (MinHash dedup, ANN, text stats) — the shapes that
    dominate at 100 TB.
  * EXCLUDED by design: the side-effecting roundtrip harnesses
    (windowed_*/session_windows/streaming_ingest_roundtrip/
    anomaly_job_roundtrip — they stage temp files and drive real
    StreamingQueries whose trigger/teardown dominates wall time) and the
    MLlib train/score queries (rt_model_predictions/rt_scoring_roundtrip —
    RandomForest fit cost, not engine throughput). Their correctness is
    covered by CORRECTNESS entries and pytest; benching them would measure
    the harness, not the engine.
  * If a query's two timed runs disagree by >2x, a third run is taken and
    the best kept: with ~300 generated expression classes live, HotSpot
    occasionally deoptimizes/recompiles mid-run (observed as a one-off
    5.1s on a steady-state-1.2s query) — a JVM artifact, not a plan cost.
  * Known benign noise: a terminating StreamingQuery's final micro-batch
    can deliver task-end accumulator updates after its SQL execution is
    unregistered; local-mode Spark logs "Failed to update accumulator
    (Unknown class)" at ERROR. Harmless (rc=0, results unaffected),
    non-deterministic, and absent from clean runs — documented so a log
    reader doesn't mistake it for a failure.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # reference-surface shapes
    "count_raw",
    "parse_enrich",
    "batch_ip_stats",
    "hourly_reagg",
    "zscore_anomaly",
    "anomaly_detail",
    "training_features",
    "predict_features",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "returned_items",
    "top_endpoints",
    "top_endpoints_bounded",
    "distinct_users",
    "approx_distinct_users",
    "salted_ip_stats",
    "salted_user_join",
    "bpe_pair_counts",
    "stateful_key_profiles",
    "traffic_forecast",
    # corpus / data-pipeline shapes (M6)
    "exact_dedup_events",
    "incremental_new_docs",
    "minhash_dedup_pairs",
    "simhash_near_dup",
    "ngram_jaccard_pairs",
    "clean_corpus",
    "curate_corpus",
    "latency_percentiles",
    "latency_percentiles_approx",
    "asof_last_purchase",
    "scd2_user_plans",
    "rolling_7d_avg",
    "traffic_rollup",
    "purchase_window_counts",
    "conversion_funnel",
    "cohort_retention",
    "dataset_split_counts",
    "stratified_sample_events",
    "grouped_split_users",
    "per_source_sample",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "embedding_lsh_pairs",
    "token_stats",
    "language_id",
    "doc_quality",
    "doc_fingerprint",
    "multimodal_features",
    # round-3 additions: cluster resolution, decontamination, PII,
    # repetition gates, packing, domain mixing
    "dedup_clusters",
    "exact_jaccard_pairs",
    "contamination_check",
    "pii_redaction",
    "repetition_stats",
    "pack_chunks",
    "temperature_sample_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from nginx_analytics_spark import registry
    from nginx_analytics_spark.session import get_spark

    spark = get_spark(
        app_name="nginx_analytics_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    queries = registry.queries()

    def run(name: str) -> float:
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run("count_raw")  # warmup (untimed)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        a, b = run(name), run(name)
        if max(a, b) > 2 * min(a, b):  # JIT deopt suspected — see docstring
            a = min(a, run(name))
        timings[name] = round(min(a, b), 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline query suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
