"""Query registry — the engine's public query surface.

Every implemented operator from SURVEY.md §2 is exposed here as a named
query ``(spark, sf_dir) -> DataFrame`` together with (where SQL-expressible)
an ANSI-SQL oracle that DuckDB runs over the same parquet tables. The
``__spark_entry__.py`` driver contract re-exports these dicts.

Conventions (driver hash-compare is exact):
  * every computed column is aliased identically in Spark and SQL;
  * float aggregates are rounded (6 dp; money sums 2 dp) on BOTH sides with
    the engine-portable half-up formula (functions.rounding) — Spark's and
    DuckDB's ``round()`` diverge on decimal-tie doubles;
  * ns-precision fixture timestamps are truncated to microseconds on both
    sides (Spark reader does it natively; oracles CAST(ts AS TIMESTAMP));
  * NOW()-relative predicates use the fixed AS_OF constant;
  * every LIMIT is ordered by a unique key;
  * derived integer outputs are BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nginx_analytics_spark.functions.rounding import half_up, half_up_sql
from nginx_analytics_spark.operators import aggregates, anomaly, features, ranking
from nginx_analytics_spark.operators.logview import EVENTS_PARSED_SQL, events_parsed
from nginx_analytics_spark.sources import load_table

# Fixed "now" for NOW()-relative predicates: just past the fixture's last
# event (events span 2024-01-01 .. 2024-01-30; TESTDATA.md, seed=42).
AS_OF = "2024-01-31 00:00:00"
BATCH_START = "2024-01-30 00:00:00"  # current "micro-batch" = trailing 1 day
HISTORY_START = "2024-01-23 00:00:00"  # 7-day hourly history before the batch

# Fixture-scaled anomaly thresholds (reference defaults are |z|>3, count>100
# — anomaly.Z_THRESHOLD/NEW_KEY_COUNT_THRESHOLD; the synthetic fixture's
# 15-50 users need tighter bounds to exercise both rule branches).
FIXTURE_Z = 1.5
FIXTURE_NEW_KEY_COUNT = 10

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Driver check order. The external driver walks ``queries()`` in dict
# order and records a bounded number of CORRECTNESS rows per round (50
# observed in r3 and r4), so ordering is part of the verification
# contract. STANDING ROTATION POLICY (VERDICT r4 item 1): each round,
# _CHECK_FIRST holds (a) queries that have never had a driver row (new
# this round) and (b) the cohort whose last green row is oldest, so no
# query's hash-green record goes more than one round stale. Everything
# else sits in the middle in registration order (re-confirmed as budget
# allows); _CHECK_LAST holds the most expensive queries holding a green
# row from the PREVIOUS round — re-checking them adds wall time, not
# record. A doc-lint test pins every listed name to a registered query.
#
# Round 16 (executing the r15 verdict item 1 rotation). Freshness going
# in (computed over CORRECTNESS_r1..r15): 50 names r15, 50 names r14,
# 42 names last green r13 — the registry's own designated r15 spill
# list, exactly — zero older, ZERO reds anywhere. (The r15 verdict's
# prose said "34 r13-stale"; the recomputed histogram says 42 — the
# list below IS the measured cohort.) The due set is 44 = 2 newcomers
# (quality_survivors X100, incremental_exact_substring_docs X101 — no
# driver row yet) + the 42-name r13 cohort; the remaining ~6 rows of a
# 50-row budget fall on r14 family heads chosen for FAMILY BREADTH so
# no operator family's freshest row predates r15 (44 + 6 checked heads
# ≈ the 50-row budget; 7 heads are listed — the last spills first):
#   * positions 1-2: the newcomers — quality_survivors (X100
#     quality-aware survivor selection, r15 verdict item 6) and
#     incremental_exact_substring_docs (X101 seen-window span loop);
#   * positions 3-44: the r13 cohort in the order the r15 verdict
#     pre-committed (expensive pair/roundtrip/iterative shapes first,
#     then alphabetical);
#   * positions 45-51: 7 r14 family heads — streaming roundtrip
#     (anomaly_job_roundtrip), ML serving (rt_model_predictions),
#     multimodal (multimodal_features), sketch rollup
#     (theta_user_overlap), banded at-rest incremental
#     (incremental_near_dups_probe), TPC-H join/agg (market_share),
#     tokenizer apply (bpe_tokens);
#   * positions 52+: the DESIGNATED r16 SPILL = the remaining 43 r14
#     names, expensive/roundtrip shapes first then alphabetical — any
#     budget beyond ~50 lands on them in this order, and they lead
#     r17's due set otherwise. Every spilled name stays oracle-verified
#     at both pytest tiers every round.
_CHECK_FIRST = [
    # --- positions 1-2: new this round, no driver row yet ---
    "quality_survivors",
    "incremental_exact_substring_docs",
    # --- positions 3-44: the r13 cohort (r15's designated spill) ---
    "temperature_sample_docs",
    "minhash_lsh_pairs",
    "session_windows",
    "ann_pq_topk",
    "ann_ivf_indexed",
    "brand_size_revenue",
    "zscore_anomaly",
    "doc_quality",
    "dedup_clusters",
    "dedup_ingest_roundtrip",
    "embedding_dedup_pairs",
    "quality_classifier_scores",
    "contamination_check",
    "bpe_pair_counts",
    "ann_pq_indexed_residual",
    "ann_pq_indexed_residual_refined",
    "ann_pq_topk_refined",
    "anomaly_detail",
    "batch_ip_stats",
    "corpus_report",
    "count_raw",
    "dataset_split_counts",
    "distinct_users",
    "doc_chunks",
    "dominant_suppliers",
    "embedding_centroids",
    "engaged_users",
    "error_only_users",
    "hourly_reagg",
    "idle_customers",
    "important_parts",
    "incremental_ip_stats",
    "language_id",
    "latency_percentiles",
    "latency_percentiles_approx",
    "quality_weighted_sample",
    "top_endpoints",
    "training_features",
    "value_buckets_approx",
    "value_deciles",
    "value_trends",
    "waiting_suppliers",
    # --- positions 45-51: 7 r14 family heads (breadth-first) ---
    "anomaly_job_roundtrip",
    "rt_model_predictions",
    "multimodal_features",
    "theta_user_overlap",
    "incremental_near_dups_probe",
    "market_share",
    "bpe_tokens",
    # --- positions 52+: the designated r16 spill (r14 cohort rest) ---
    # expensive pair/roundtrip/iterative shapes first
    "jaccard_pairs_prefix",
    "simhash_near_dup",
    "curate_corpus",
    "stateful_key_profiles",
    "incremental_embedding_near_dups_probe",
    "incremental_embedding_near_dups",
    "incremental_near_dups",
    "streaming_ingest_roundtrip",
    "rt_scoring_roundtrip",
    "exact_dedup_events",
    # then the remaining r14 names, alphabetical
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_indexed",
    "asof_last_purchase",
    "bpe_tokens_pretrained",
    "clean_corpus",
    "cms_user_counts_7d",
    "data_expectations",
    "doc_fingerprint",
    "embedding_lsh_pairs",
    "frame_features",
    "incremental_new_docs",
    "kll_latency_percentiles_7d",
    "local_supplier_volume",
    "ngram_jaccard_pairs",
    "pack_chunks",
    "per_source_sample",
    "predict_features",
    "purchase_window_counts",
    "repetition_stats",
    "rolling_7d_avg",
    "salted_ip_stats",
    "salted_user_join",
    "shard_manifest",
    "shipping_priority",
    "sliding_windowed_events",
    "stream_stream_left_join",
    "tfidf_top_terms",
    "top_endpoints_bounded",
    "traffic_rollup",
    "value_rank_profile",
    "weighted_sample_docs",
    "windowed_events",
]
# Expensive queries holding a FRESH green row (r15) — re-checking them
# within the same budget would only displace due rows, so they sit
# last, after the r15-green middle. (The five are the costliest
# r15-fresh names in the committed r15 bench_full per-query walls.)
_CHECK_LAST = [
    "jaccard_pairs_prefix_capped",
    "incremental_jaccard_prefix_probe",
    "incremental_jaccard_prefix",
    "exact_jaccard_pairs",
    "prefix_cap_report",
]


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _driver_ordered(d: dict) -> dict:
    pinned = set(_CHECK_FIRST) | set(_CHECK_LAST)
    first = [n for n in _CHECK_FIRST if n in d]
    mid = [n for n in d if n not in pinned]
    last = [n for n in _CHECK_LAST if n in d]
    return {n: d[n] for n in first + mid + last}


def queries() -> dict[str, QueryFn]:
    return _driver_ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _driver_ordered(_ORACLES)


# --------------------------------------------------------------------------
# M1 — counts, parse/enrich, per-key stats
# --------------------------------------------------------------------------


@query("count_raw", "SELECT count(*) AS n_rows FROM lineitem")
def count_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 global count (reference README.md:35)."""
    return aggregates.global_count(load_table(spark, sf_dir, "lineitem"))


@query("parse_enrich", EVENTS_PARSED_SQL)
def parse_enrich_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P4/P6-P8 over the events fixture (reference ingestor/main.py:66-81)."""
    return events_parsed(load_table(spark, sf_dir, "events"))


@query(
    "batch_ip_stats",
    f"""
    SELECT user_id,
           count(*) AS request_count,
           {half_up_sql("avg(value)")} AS avg_request_time
    FROM events
    GROUP BY user_id
    """,
)
def batch_ip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 per-key count+avg (reference anomaly_detection.py:25-29)."""
    return aggregates.key_stats(
        load_table(spark, sf_dir, "events"), "user_id", "value"
    )


# --------------------------------------------------------------------------
# M2 — history reagg, z-score anomaly chain, features, rankings
# --------------------------------------------------------------------------

_HOURLY_SQL = f"""
    SELECT user_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_bucket,
           count(*) AS request_count
    FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '{{lo}}'
      AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '{{hi}}'
    GROUP BY 1, 2
"""

_HISTORY_SQL = f"""
    SELECT user_id,
           {half_up_sql("avg(request_count)")} AS avg_requests,
           {half_up_sql("stddev(request_count)")} AS stddev_requests
    FROM ({_HOURLY_SQL.format(lo=HISTORY_START, hi=BATCH_START)}) hourly
    GROUP BY user_id
"""


@query(
    "hourly_reagg",
    f"""
    SELECT user_id,
           {half_up_sql("avg(request_count)")} AS avg_requests,
           {half_up_sql("stddev(request_count)")} AS stddev_requests
    FROM ({_HOURLY_SQL.format(lo=HISTORY_START, hi=AS_OF)}) hourly
    GROUP BY user_id
    """,
)
def hourly_reagg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 two-level reagg with parameterized as_of
    (reference anomaly_detection.py:36-49)."""
    return aggregates.hourly_reagg(
        load_table(spark, sf_dir, "events"),
        key="user_id",
        ts="ts",
        as_of=AS_OF,
        lookback_days=8,
    )


_ZSCORE_SQL = f"""
    WITH batch AS (
        SELECT * FROM events
        WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '{BATCH_START}'
          AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '{AS_OF}'
    ),
    batch_stats AS (
        SELECT user_id,
               count(*) AS request_count,
               {half_up_sql("avg(value)")} AS avg_request_time
        FROM batch GROUP BY user_id
    ),
    history AS ({_HISTORY_SQL}),
    scored AS (
        SELECT b.user_id, b.request_count, b.avg_request_time,
               h.avg_requests, h.stddev_requests,
               {half_up_sql('''(b.request_count - h.avg_requests)
                     / nullif(h.stddev_requests, 0)''')} AS z_score
        FROM batch_stats b LEFT JOIN history h USING (user_id)
    )
    SELECT user_id, request_count, avg_request_time, avg_requests,
           stddev_requests, z_score,
           ((z_score IS NOT NULL AND abs(z_score) > {FIXTURE_Z})
            OR (avg_requests IS NULL AND request_count > {FIXTURE_NEW_KEY_COUNT}))
               AS is_anomaly,
           CASE WHEN z_score > {FIXTURE_Z} THEN 'Traffic spike detected'
                WHEN z_score < -{FIXTURE_Z} THEN 'Traffic drop detected'
                WHEN avg_requests IS NULL
                     AND request_count > {FIXTURE_NEW_KEY_COUNT}
                     THEN 'New high-volume source'
                ELSE NULL END AS anomaly_reason
    FROM scored
"""


def _zscore_frames(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    lo, hi = F.lit(BATCH_START).cast("timestamp"), F.lit(AS_OF).cast("timestamp")
    batch = ev.filter((F.col("ts") > lo) & (F.col("ts") <= hi))
    history = aggregates.hourly_reagg(
        ev, key="user_id", ts="ts", as_of=BATCH_START, lookback_days=7
    )
    stats = aggregates.key_stats(batch, "user_id", "value")
    scored = anomaly.score_keys(
        stats,
        history,
        "user_id",
        z_threshold=FIXTURE_Z,
        new_key_count=FIXTURE_NEW_KEY_COUNT,
    )
    return batch, scored


@query("zscore_anomaly", _ZSCORE_SQL)
def zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + P9/P11-P15: per-key z-score scoring of the trailing-day batch
    against the prior 7-day hourly history (reference
    anomaly_detection.py:56-75)."""
    _, scored = _zscore_frames(spark, sf_dir)
    return scored


@query(
    "anomaly_detail",
    f"""
    WITH scored AS ({_ZSCORE_SQL}),
    anomalies AS (
        SELECT user_id,
               {half_up_sql("abs(z_score)")} AS anomaly_score,
               is_anomaly, anomaly_reason
        FROM scored WHERE is_anomaly
    )
    SELECT CAST(e.ts AS TIMESTAMP) AS "timestamp",
           e.user_id,
           '/api/' || e.event_type || '/u' || e.user_id AS request_uri,
           a.anomaly_score, a.is_anomaly, a.anomaly_reason
    FROM events e
    JOIN anomalies a USING (user_id)
    WHERE CAST(e.ts AS TIMESTAMP) > TIMESTAMP '{BATCH_START}'
      AND CAST(e.ts AS TIMESTAMP) <= TIMESTAMP '{AS_OF}'
    """,
)
def anomaly_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3 + P11/P21: sample requests for anomalous keys
    (reference anomaly_detection.py:80-98)."""
    batch, scored = _zscore_frames(spark, sf_dir)
    anomalies = scored.filter(F.col("is_anomaly"))
    batch_uri = batch.withColumn(
        "request_uri",
        F.concat(
            F.lit("/api/"),
            F.col("event_type"),
            F.lit("/u"),
            F.col("user_id").cast("string"),
        ),
    )
    return anomaly.detail(batch_uri, anomalies, "user_id", "ts", "request_uri")


_FEATURES_INPUT_SQL = f"""
    SELECT endpoint,
           CASE CAST(prop_k % 3 AS BIGINT) WHEN 0 THEN 'GET' WHEN 1 THEN 'POST'
                ELSE 'PUT' END AS request_method,
           CAST(100 + prop_k * 10 AS BIGINT) AS request_length,
           ts AS "timestamp",
           CASE WHEN prop_k % 7 = 0 THEN ''
                ELSE 'C' || CAST(prop_k % 7 AS VARCHAR) END
               AS geoip2_country_code,
           CAST(200 + (prop_k % 5) * 100 AS BIGINT) AS status_code,
           value_seconds AS request_time_seconds,
           event_id
    FROM ({EVENTS_PARSED_SQL}) parsed
"""

_FEATURES_SQL_TMPL = f"""
    SELECT endpoint, request_method,
           CAST(request_length AS FLOAT) AS request_length,
           CAST(EXTRACT(HOUR FROM "timestamp") AS BIGINT) AS hour_of_day,
           CASE WHEN geoip2_country_code IS NULL OR geoip2_country_code = ''
                THEN 'UNKNOWN' ELSE geoip2_country_code END AS country,
           status_code, request_time_seconds
    FROM ({_FEATURES_INPUT_SQL}) fi
    WHERE request_time_seconds IS NOT NULL
      AND request_time_seconds > 0
      AND endpoint <> ''
    {{tail}}
"""

_FEATURES_SQL = _FEATURES_SQL_TMPL.format(tail="")


def _features_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = events_parsed(load_table(spark, sf_dir, "events"))
    k = F.col("prop_k")
    return parsed.select(
        "endpoint",
        F.when(k % 3 == 0, "GET").when(k % 3 == 1, "POST").otherwise("PUT").alias(
            "request_method"
        ),
        (F.lit(100) + k * 10).cast("bigint").alias("request_length"),
        F.col("ts").alias("timestamp"),
        F.when(k % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit("C"), (k % 7).cast("string"))
        ).alias("geoip2_country_code"),
        (F.lit(200) + (k % 5) * 100).cast("bigint").alias("status_code"),
        F.col("value_seconds").alias("request_time_seconds"),
        "event_id",
    )


@query(
    "training_features",
    _FEATURES_SQL_TMPL.format(
        tail=f"ORDER BY fi.event_id LIMIT {features.TRAINING_CAP}"
    ),
)
def training_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/P16/P17/P20 + ordered cap (reference
    response_time_prediction.py:71-87)."""
    return features.training_features(
        _features_input(spark, sf_dir), order_key="event_id"
    )


@query("predict_features", _FEATURES_SQL)
def predict_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DF twin of the training projection, intent-correct conjunction
    (reference response_time_prediction.py:161-174; bug note SURVEY §2.2²)."""
    return features.feature_projection(_features_input(spark, sf_dir))


@query(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {half_up_sql("sum(l_quantity)", 2)} AS sum_qty,
           {half_up_sql("sum(l_extendedprice)", 2)} AS sum_base_price,
           {half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)}
               AS sum_disc_price,
           {half_up_sql("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)}
               AS sum_charge,
           {half_up_sql("avg(l_quantity)")} AS avg_qty,
           {half_up_sql("avg(l_extendedprice)")} AS avg_price,
           {half_up_sql("avg(l_discount)")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over lineitem — the engine's headline batch-agg
    benchmark (sum/avg/count the reference never exposes, SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            half_up(F.sum("l_quantity"), 2).alias("sum_qty"),
            half_up(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            half_up(F.sum(disc_price), 2).alias("sum_disc_price"),
            half_up(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            half_up(F.avg("l_quantity")).alias("avg_qty"),
            half_up(F.avg("l_extendedprice")).alias("avg_price"),
            half_up(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "shipping_priority",
    f"""
    SELECT l_orderkey,
           {half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the engine's headline multi-join: selective dim
    filter -> broadcast hash join -> fact join -> partial+final hash agg ->
    top-k. customer is explicitly broadcast (a filtered dimension always
    is at 100 TB); the orders-lineitem join shuffles on orderkey and AQE
    re-plans it to broadcast when the filtered side turns out small.
    Ordered LIMIT with unique-key tie-break for determinism."""
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "local_supplier_volume",
    f"""
    SELECT n_name,
           {half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)}
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the engine's deepest join tree (6 tables): the
    region->nation->supplier dimension chain collapses to a broadcast
    before it ever touches a fact row; lineitem joins date-filtered
    orders on orderkey (the one genuine shuffle); customer closes the
    cycle on (custkey, nationkey) — the classic "local" supplier
    condition that makes Q5 a join-ORDER test, not just a join test.
    At 100 TB: two broadcasts + one fact shuffle, partial aggs on
    n_name; AQE shrinks the orders side post-filter."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    dims = supp.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation.n_regionkey == region.r_regionkey,
            )
        ),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (dims.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "returned_items",
    f"""
    SELECT c_custkey, c_name,
           {half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)}
               AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item revenue ranking: quarter-filtered
    orders join return-flagged lineitems on orderkey, enrich with the
    broadcast customer->nation chain, aggregate per customer, top-20
    with unique-key tie-break. The selective l_returnflag predicate is
    pushed into the lineitem scan (1/3 of rows survive)."""
    lo = F.lit("1996-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join: orders in
    a quarter that have at least one lineitem shipped after the order
    date (the fixture carries no commit/receipt dates, so the Q4 lateness
    predicate is adapted to l_shipdate > o_orderdate). Spark plans the
    semi join as a hash join that probes and emits each order at most
    once — no fact-side duplication, no distinct; at 100 TB the
    quarter-filtered orders side shuffles once on orderkey and AQE
    broadcasts it when small."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "forecast_revenue",
    f"""
    SELECT {half_up_sql("sum(l_extendedprice * l_discount)", 2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount > 0.015 AND l_discount < 0.065
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the pure scan-aggregate: every predicate is a
    pushable column comparison (asserted in tests/test_plans.py), so the
    plan is scan -> filter -> one-row partial+final agg with zero
    shuffle of data rows. At 100 TB this is bounded by Parquet scan
    throughput alone — row groups outside the shipdate year are pruned
    by min/max stats when the table is date-sorted. The discount band
    uses strict open bounds on safe midpoints (0.015/0.065) rather than
    BETWEEN on decimal-tie doubles, keeping the float boundary
    engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") > 0.015)
            & (F.col("l_discount") < 0.065)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            half_up(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "priority_shipping",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional (CASE) aggregation over a fact-fact
    join: late-shipped lines of a year, counted into high/low priority
    classes per linestatus (the fixture has no l_shipmode, so the Q12
    group key is adapted to l_linestatus and lateness to
    l_shipdate > o_orderdate). The CASE arms are evaluated inside the
    partial agg — the shuffle carries 2 counters per (status,
    partition), not classified rows. orders joins on orderkey; the
    year filter is pushed to the lineitem scan."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    # ~high (not isin) mirrors the SQL NOT IN three-valued logic: a NULL
    # priority is neither high nor low (both CASEs fall to ELSE 0)
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@query(
    "promo_revenue",
    f"""
    SELECT {half_up_sql(
        "100.0 * sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount))"
    )} AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion revenue share: one month of lineitem
    broadcast-joined to the part dimension, a conditional-sum ratio in a
    single one-row aggregate. part is explicitly broadcast (a dimension
    never shuffles the fact side at 100 TB); the month predicate prunes
    the scan."""
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            half_up(100.0 * F.sum(promo) / F.sum(disc_price)).alias("promo_revenue")
        )
    )


@query(
    "large_volume_customers",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
           {half_up_sql("sum(l_quantity)", 2)} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING-gated IN-subquery as a semi-join: orders
    whose total lineitem quantity exceeds the threshold, enriched with
    the customer, re-aggregated, top-100 by price. The qualifying-key
    set is an aggregate (one row per order) -> small relative to the
    fact table, so it semi-joins orders without duplicating rows;
    customer is broadcast. lineitem is scanned twice (qualify +
    re-agg) — at 100 TB the first scan reduces to (orderkey, sum) pairs
    before its shuffle, the canonical partial-agg shape."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        qualifying,
        F.col("o_orderkey") == qualifying.l_orderkey,
        "left_semi",
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(half_up(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {half_up_sql("sum(volume)", 2)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume: the nation pair predicate
    is a DISJUNCTION across two different join chains (supplier's nation
    vs customer's nation), so it can only apply after both dimensions are
    attached — but each nation restriction individually pushes into its
    broadcast: supplier and customer are pre-joined to the 2-row filtered
    nation dim, shrinking both before the fact join. One orderkey
    shuffle; year() bucketing in the agg key."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations.select(F.col("n_nationkey").alias("sn_key"),
                                       F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations.select(F.col("n_nationkey").alias("cn_key"),
                                       F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "top_supplier",
    f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — argmax via scalar subquery: quarterly revenue
    per supplier, keep the supplier(s) hitting the maximum. The scalar
    max is a 1-row broadcast against the revenue frame (computed once —
    Spark reuses the rev subplan across both references under AQE);
    equality is on the PORTABLY-ROUNDED revenue, so the cross-engine
    comparison is exact. supplier is broadcast as a dimension."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "small_quantity_revenue",
    f"""
    SELECT {half_up_sql("sum(l_extendedprice) / 7.0", 2)} AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#7'
      AND l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery decorrelated to a
    per-part aggregate join: lines of one brand whose quantity is under
    half that part's average. The brand filter prunes the part dim to a
    broadcast BEFORE the per-part averages are computed, so the avg
    aggregation runs over the brand's lines only (not the whole fact
    table — the decorrelation a naive rewrite misses). Float-safe across
    engines: quantities are integral doubles, so the avg's numerator sum
    is exact regardless of summation order."""
    pb = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(F.broadcast(pb), li.l_partkey == pb.p_partkey)
    half_avg = li_b.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("_half_avg")
    )
    return (
        li_b.join(half_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(half_up(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "brand_size_revenue",
    f"""
    SELECT {half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)}
               AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 35)
    """,
)
def brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunction of conjunctions spanning BOTH join
    sides: no single arm can be fully pushed to either scan, but the
    union of per-table implications can (p_brand IN its 3 values,
    l_quantity within the hull) — Catalyst derives those residual
    predicates and pushes them, then evaluates the full disjunction
    after the broadcast join (plan-tested)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    cond = (
        arm("Brand#1", 15, 1, 15)
        | arm("Brand#2", 25, 10, 25)
        | arm("Brand#3", 35, 20, 35)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "idle_customers",
    f"""
    WITH avg_bal AS (
        SELECT {half_up_sql("avg(c_acctbal)", 6)} AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           {half_up_sql("sum(c_acctbal)", 2)} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — NOT EXISTS as a LEFT ANTI join plus a scalar
    aggregate threshold: above-average-balance customers with no order
    in the trailing window (the classic fixture has customers without
    any orders; this one doesn't, so the lateness window supplies the
    emptiness). The avg is a 1-row broadcast; the anti join probes the
    window-filtered orders — at 100 TB the window predicate prunes the
    orders scan by date partition before the anti join's shuffle.
    The scalar threshold is half_up-rounded on BOTH sides before the
    comparison: Spark's partial-agg summation order vs DuckDB's can
    differ in the last ulp, and an unrounded boundary balance would flip
    rows nondeterministically (same defense as top_supplier's argmax)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        half_up(F.avg("c_acctbal"), 6).alias("_ab")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            half_up(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "market_share",
    f"""
    SELECT o_year,
           {half_up_sql(
               "sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)"
               " / sum(volume)"
           )} AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND p_type = 'PROMO'
    ) allnations
    GROUP BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: one supplier nation's
    fraction of all promo-part volume sold into a region, per year. The
    numerator's nation predicate lives in a CASE inside the aggregate
    (NOT a filter — the denominator needs every nation), so one plan
    computes both. The part/supplier/region-nation chains broadcast;
    the orders-customer join is left to AQE (a region-filtered customer
    side is 1/5 of a big dimension — broadcastable at some scales,
    shuffled at others)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n1.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(half_up(F.sum(target) / F.sum(volume)).alias("mkt_share"))
    )


@query(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — histogram of per-customer order counts: LEFT
    OUTER join (customers with zero orders must survive as c_count=0 —
    count(o_orderkey) skips the NULL the outer join manufactures) then a
    second aggregation over the first's output. Double-agg shape: the
    first groupBy reduces to one row per customer before the second,
    histogram-sized, exchange."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---- X66: TPC-H completion (Q2/Q9/Q11/Q16/Q20/Q21 shapes) ---------------
# The fixture has no partsupp table and no l_commitdate/l_receiptdate
# (TESTDATA.md), so — like the r3/r4 shapes — these reproduce each
# query's OPERATOR COMPOSITION against the columns that exist. The
# stand-ins are declared per query; the shapes (correlated min,
# multi-way profit join, global-threshold HAVING, distinct-agg with
# anti-join exclusion, correlated-fraction semi-join, double-correlated
# EXISTS/NOT EXISTS) are the reference points.


@query(
    "min_cost_supplier",
    f"""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               {half_up_sql("avg(l_extendedprice / l_quantity)")} AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
        SELECT l_partkey, unit_cost, s_acctbal, s_name, n_name
        FROM cost
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    mc AS (SELECT l_partkey, min(unit_cost) AS min_cost
           FROM eligible GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM eligible
    JOIN mc USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE unit_cost = min_cost AND p_size <= 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — minimum-cost supplier per part in a region: a
    correlated MIN subquery decorrelated into a per-part min aggregate
    joined back on (part, cost) equality, over the supplier->nation->
    region dimension chain. partsupp stand-in: per-(part, supplier) avg
    unit price observed in lineitem. The unit cost is half_up-rounded on
    both engines BEFORE the min/equality (top_supplier's ulp defense —
    an unrounded argmin boundary would flip rows). The ordered LIMIT is
    total: (p_partkey, s_name) is unique per row. Reference shape:
    TPC-H Q2; the dimension chain broadcasts, the per-part min is the
    only exchange on the big side — and that big side is pruned FIRST:
    lineitem is broadcast-semi-joined against the filtered part keys
    BEFORE the per-(part, supplier) aggregate (r5 verdict item 4), so
    the only parts that ever reach an exchange are the ones the final
    join keeps. Per-part MIN is unaffected: the min is within a part,
    and whole parts are what the semi-join removes."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_type")
    )
    li = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        half_up(F.avg(F.col("l_extendedprice") / F.col("l_quantity"))).alias(
            "unit_cost"
        )
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = cost.join(
        F.broadcast(supp), cost.l_suppkey == supp.s_suppkey
    ).select("l_partkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    mc = eligible.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        eligible.join(mc, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@query(
    "product_profit",
    f"""
    SELECT nation, o_year, {half_up_sql("sum(amount)", 2)} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - 0.6 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and order
    year: a five-table join fanning the fact against part (name LIKE
    filter), supplier->nation, and orders (year extraction), aggregated
    on (nation, year). ps_supplycost stand-in: 0.6 * p_retailprice per
    unit. part/supplier/nation broadcast after their filters; the
    orders join is the one big-side exchange; the LIKE predicate pushes
    to the part scan and prunes the fact via the broadcast hash."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(half_up(F.sum(amount), 2).alias("sum_profit"))
    )


@query(
    "important_parts",
    f"""
    WITH supp_n AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    nval AS (
        SELECT l_partkey, l_extendedprice * l_quantity AS v
        FROM lineitem JOIN supp_n ON l_suppkey = s_suppkey
    ),
    val AS (
        SELECT l_partkey, {half_up_sql("sum(v)", 2)} AS part_value
        FROM nval GROUP BY l_partkey
    ),
    tot AS (SELECT {half_up_sql("avg(part_value) * 2.0", 2)} AS threshold FROM val)
    SELECT l_partkey AS partkey, part_value
    FROM val, tot
    WHERE part_value > threshold
    """,
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — important stock: per-part value from one
    region's suppliers, kept only where it exceeds a FRACTION OF THE
    aggregate of the SAME aggregate (a scalar subquery threshold — the
    HAVING > global-threshold shape). partsupp value stand-in:
    sum(l_extendedprice * l_quantity) from that region's lineitems; the
    threshold is 2x the average per-part value, the scale-free analogue
    of Q11's SF-scaled fraction
    (region, not Q11's single nation: every fixture SF populates every
    region, while the sf0.001 supplier table leaves most single nations
    empty). One shared region-filtered fact feeds both the per-part
    aggregate and the 1-row broadcast total; both sides round half_up
    before the comparison (ulp defense). At 100 TB the supplier
    semi-join prunes the fact before either exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    nval = li.join(
        F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi"
    ).select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    val = nval.groupBy("l_partkey").agg(half_up(F.sum("v"), 2).alias("part_value"))
    tot = val.agg(half_up(F.avg("part_value") * 2.0, 2).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@query(
    "supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier relationship counts: DISTINCT-supplier
    aggregation per (brand, type, size) with a negated-IN supplier
    exclusion (the reference's 'customer complaints' filter; stand-in:
    negative account balance) and multi-value/negation part predicates.
    The NOT IN is a LEFT ANTI join (keys are non-null by schema); the
    distinct-agg expands to a two-phase (keys+suppkey dedup, then
    count) under Catalyst."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "dominant_suppliers",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        FROM lineitem JOIN red ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    part_tot AS (SELECT l_partkey, sum(qty) AS tot FROM shipped GROUP BY l_partkey)
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN part_tot USING (l_partkey)
        WHERE qty > 0.3 * tot)
    """,
)
def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — part-promotion candidates: suppliers selected
    through an IN chain whose inner query compares a per-(supplier,
    part) aggregate against a correlated per-part aggregate (availqty
    stand-in: the supplier shipped > 30% of a 'red%' part's total 1997
    volume). The correlated comparison decorrelates into two aggs over
    one shared shipped frame joined on the part key; the supplier IN is
    a LEFT SEMI join. Quantities are integral by fixture construction,
    so the sums (and the 0.3 * tot product) are bit-identical across
    engines — no rounding needed."""
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    shipped = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("tot"))
    dominant = (
        shipped.join(part_tot, "l_partkey")
        .filter(F.col("qty") > 0.3 * F.col("tot"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@query(
    "waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who kept orders waiting: the
    double-correlated EXISTS / NOT EXISTS pair (another supplier was on
    the order; no other supplier was late) over finished orders.
    Lateness stand-in (no l_receiptdate/l_commitdate in the fixture):
    shipped more than 60 days after the order date. EXISTS becomes a
    LEFT SEMI and NOT EXISTS a LEFT ANTI against the same lineitem
    scans, keyed on the order — the canonical Q21 physical plan; the
    late set is computed once and reused for both the probe side and
    the anti side."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    deadline = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > deadline)
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("_lok"), F.col("l_suppkey").alias("_lsk")
    )
    l1 = (
        late.join(
            others,
            (F.col("_ok") == F.col("l_orderkey"))
            & (F.col("_sk") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("_lok") == F.col("l_orderkey"))
            & (F.col("_lsk") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "top_endpoints",
    """
    SELECT event_type, event_id, value, rn
    FROM (
        SELECT event_type, event_id, value,
               CAST(row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id ASC) AS BIGINT) AS rn
        FROM events
    ) ranked
    WHERE rn <= 5
    """,
)
def top_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k per key (SURVEY §2.5 gap-fill / M6)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ranking.topk_per_key(ev, "event_type", "value", "event_id", 5)
        .select(
            "event_type", "event_id", "value", F.col("rn").cast("bigint").alias("rn")
        )
    )


@query(
    "top_endpoints_bounded",
    """
    SELECT event_type, event_id, value, rn
    FROM (
        SELECT event_type, event_id, value,
               CAST(row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id ASC) AS BIGINT) AS rn
        FROM events
    ) ranked
    WHERE rn <= 5
    """,
)
def top_endpoints_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase bounded top-k (SURVEY §2.5 / VERDICT r1 item 3): identical
    semantics to ``top_endpoints``, but each input partition is truncated to
    its local top-k per key before the exchange, so the shuffle volume is
    bounded by k x n_batches per key regardless of group size."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return (
        ranking.topk_per_key_bounded(ev, "event_type", "value", "event_id", 5)
        .select(
            "event_type", "event_id", "value", F.col("rn").cast("bigint").alias("rn")
        )
    )


@query(
    "distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS distinct_keys,
           count(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (SURVEY §2.4 note)."""
    return aggregates.distinct_counts(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


@query("approx_distinct_users")  # estimate — rows-only check, no SQL oracle
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimate — the 100 TB-scale variant."""
    return aggregates.approx_distinct_counts(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


# --------------------------------------------------------------------------
# M4 — streaming (T1/T2/T3/T4 exercised through a real StreamingQuery)
# --------------------------------------------------------------------------


@query(
    "windowed_events",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    m AS (SELECT max(ts) - INTERVAL '1 minute' AS wm FROM e),
    b AS (
        SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
               event_type, count(*) AS n_events
        FROM e GROUP BY 1, 2
    )
    SELECT window_start,
           window_start + INTERVAL '1 minute' AS window_end,
           event_type, n_events
    FROM b, m
    WHERE window_start + INTERVAL '1 minute' <= m.wm
    """,
)
def windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2+A5 as a REAL streaming query: watermark 1 min, tumbling 1-min
    window, append mode, Trigger.AvailableNow (reference
    anomaly_detection.py:179-185). The oracle replicates append-mode
    emission: only windows whose end <= max(event_time) - delay are out."""
    from nginx_analytics_spark.sources.readers import events_stream
    from nginx_analytics_spark.streaming.windows import (
        run_windowed_counts_available_now,
    )

    stream = events_stream(spark, sf_dir)
    return run_windowed_counts_available_now(
        stream, ts="ts", delay="1 minute", window="1 minute", keys=("event_type",)
    )


@query(
    "sliding_windowed_events",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    m AS (SELECT max(ts) - INTERVAL '1 minute' AS wm FROM e),
    b AS (
        SELECT time_bucket(INTERVAL '1 minute', e.ts)
                   - (o.i * INTERVAL '1 minute') AS window_start,
               event_type, count(*) AS n_events
        FROM e CROSS JOIN (SELECT unnest([0, 1]) AS i) o
        GROUP BY 1, 2
    )
    SELECT window_start,
           window_start + INTERVAL '2 minutes' AS window_end,
           event_type, n_events
    FROM b, m
    WHERE window_start + INTERVAL '2 minutes' <= m.wm
    """,
)
def sliding_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding/hopping windows (2-min width, 1-min slide) as a real
    streaming query — each event lands in 2 overlapping windows; append
    emission once the watermark passes a window's end. Extends the
    reference's tumbling-only surface (SURVEY.md §2.6)."""
    from nginx_analytics_spark.sources.readers import events_stream
    from nginx_analytics_spark.streaming.windows import (
        run_sliding_counts_available_now,
    )

    stream = events_stream(spark, sf_dir)
    return run_sliding_counts_available_now(
        stream, ts="ts", delay="1 minute", window="2 minutes", slide="1 minute",
        keys=("event_type",),
    )


@query(
    "session_windows",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
    m AS (SELECT max(ts) - INTERVAL '1 minute' AS wm FROM e),
    s AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '12 hours'
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM s
    ),
    agg AS (
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '12 hours' AS session_end,
               count(*) AS n_events
        FROM g GROUP BY user_id, sid
    )
    SELECT session_start, session_end, user_id, n_events
    FROM agg, m
    WHERE session_end <= m.wm
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (F.session_window, 12 h gap) as a real
    streaming query. The oracle replicates sessionization with lag/sum
    window functions; the boundary matches Spark's half-open session
    interval (an event at exactly last+gap merges, beyond it starts a new
    session — verified empirically). Sessions are emitted once the
    watermark passes last_event + gap."""
    from nginx_analytics_spark.sources.readers import events_stream
    from nginx_analytics_spark.streaming.windows import (
        run_session_counts_available_now,
    )

    stream = events_stream(spark, sf_dir)
    return run_session_counts_available_now(
        stream, ts="ts", delay="1 minute", gap="12 hours", keys=("user_id",)
    )


@query("streaming_ingest_roundtrip")  # rows-only: multi-sink side effects
def streaming_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/T3/T5 end-to-end: synthesize nginx JSONL from the fixture, stream
    it through the real parse_enrich ingest (foreachBatch -> partitioned
    Parquet warehouse), read the warehouse back and return per-date counts.
    """
    import shutil
    import tempfile

    from nginx_analytics_spark.operators.logview import events_as_nginx_jsonl
    from nginx_analytics_spark.sources.warehouse import Warehouse
    from nginx_analytics_spark.streaming.ingest import jsonl_stream, start_ingest

    work = tempfile.mkdtemp(prefix="nas_ingest_")
    jsonl_dir, wh_dir, ckpt = (
        f"{work}/jsonl",
        f"{work}/warehouse",
        f"{work}/ckpt",
    )
    events_as_nginx_jsonl(load_table(spark, sf_dir, "events")).coalesce(
        4
    ).write.mode("overwrite").text(jsonl_dir)
    wh = Warehouse(spark, wh_dir)
    q = start_ingest(
        jsonl_stream(spark, jsonl_dir), wh, ckpt, trigger={"availableNow": True}
    )
    q.awaitTermination()
    out = (
        wh.table("raw_logs")
        .groupBy("log_date")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("log_date")
    )
    rows = out.collect()
    shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# The streaming anomaly job's oracle. The job seeds raw_logs with events at
# or before BATCH_START; raw_logs_window(AS_OF, 7) then clips history to
# (AS_OF - 7 days, BATCH_START]. Derived from AS_OF so a future change to
# either constant can't silently desynchronize oracle and Spark path.
_JOB_HISTORY_LO = (
    datetime.fromisoformat(AS_OF) - timedelta(days=7)
).strftime("%Y-%m-%d %H:%M:%S")

_ANOM_SRC_SQL = """
    SELECT CAST(ts AS TIMESTAMP) AS "timestamp",
           'u' || CAST(user_id AS VARCHAR) AS remote_addr,
           value AS request_time_seconds,
           '/api/' || event_type || '/u' || CAST(user_id AS VARCHAR)
               AS request_uri,
           event_id
    FROM events
"""


def _anom_batch_ctes(p: int) -> str:
    """Detection over one parity micro-batch — mirrors detect_batch in
    streaming/windows.py (stats -> left-join history -> rule -> detail)."""
    return f"""
    stats_{p} AS (
        SELECT remote_addr, count(*) AS request_count
        FROM src
        WHERE "timestamp" > TIMESTAMP '{BATCH_START}' AND event_id % 2 = {p}
        GROUP BY remote_addr
    ),
    scored_{p} AS (
        SELECT s.remote_addr, s.request_count, h.avg_requests,
               {half_up_sql('''(s.request_count - h.avg_requests)
                     / nullif(h.stddev_requests, 0)''')} AS z_score
        FROM stats_{p} s LEFT JOIN history h USING (remote_addr)
    ),
    flag_{p} AS (
        SELECT remote_addr,
               {half_up_sql("abs(z_score)")} AS anomaly_score,
               TRUE AS is_anomaly,
               CASE WHEN z_score > {FIXTURE_Z} THEN 'Traffic spike detected'
                    WHEN z_score < -{FIXTURE_Z} THEN 'Traffic drop detected'
                    WHEN avg_requests IS NULL
                         AND request_count > {FIXTURE_NEW_KEY_COUNT}
                         THEN 'New high-volume source'
                    ELSE NULL END AS anomaly_reason
        FROM scored_{p}
        WHERE (z_score IS NOT NULL AND abs(z_score) > {FIXTURE_Z})
           OR (avg_requests IS NULL AND request_count > {FIXTURE_NEW_KEY_COUNT})
    ),
    det_{p} AS (
        SELECT b."timestamp", b.remote_addr, b.request_uri,
               f.anomaly_score, f.is_anomaly, f.anomaly_reason
        FROM src b JOIN flag_{p} f USING (remote_addr)
        WHERE b."timestamp" > TIMESTAMP '{BATCH_START}' AND b.event_id % 2 = {p}
    )"""


_ANOMALY_JOB_SQL = f"""
    WITH src AS ({_ANOM_SRC_SQL}),
    hourly AS (
        SELECT remote_addr,
               date_trunc('hour', "timestamp") AS hour_bucket,
               count(*) AS request_count
        FROM src
        WHERE "timestamp" > TIMESTAMP '{_JOB_HISTORY_LO}'
          AND "timestamp" <= TIMESTAMP '{BATCH_START}'
        GROUP BY 1, 2
    ),
    history AS (
        SELECT remote_addr,
               {half_up_sql("avg(request_count)")} AS avg_requests,
               {half_up_sql("stddev(request_count)")} AS stddev_requests
        FROM hourly GROUP BY remote_addr
    ),
    {_anom_batch_ctes(0)},
    {_anom_batch_ctes(1)}
    SELECT * FROM det_0 UNION ALL SELECT * FROM det_1
"""


@query("anomaly_job_roundtrip", _ANOMALY_JOB_SQL)
def anomaly_job_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/S5/A4 end-to-end: the streaming z-score anomaly job (reference
    anomaly_detection.py:17-114) driven over two deterministic micro-batches
    against warehouse-seeded history; returns the anomalies sink contents.
    The oracle recomputes each micro-batch's detection in SQL and unions
    them — exact, because per-batch detection is independent."""
    import shutil
    import tempfile

    from nginx_analytics_spark.jobs import run_anomaly_roundtrip

    work = tempfile.mkdtemp(prefix="nas_anomjob_")
    try:
        out = run_anomaly_roundtrip(
            spark,
            sf_dir,
            work,
            as_of=AS_OF,
            batch_start=BATCH_START,
            z_threshold=FIXTURE_Z,
            new_key_count=FIXTURE_NEW_KEY_COUNT,
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# M5 — ML (not SQL-expressible: rows-only checks)
# --------------------------------------------------------------------------


@query("rt_model_predictions")  # MLlib — rows-only check
def rt_model_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2-U7: train the response-time pipeline on the training projection,
    score the predict projection, return the predictions shape
    (reference response_time_prediction.py:99-144, :194-203)."""
    import tempfile

    from nginx_analytics_spark.ml import response_time

    feats = features.training_features(
        _features_input(spark, sf_dir), order_key="event_id"
    )
    model_path = tempfile.mkdtemp(prefix="nas_model_") + "/response_time_model"
    model = response_time.train(feats, model_path=model_path)
    if model is None:  # below the 100-row reference gate
        return spark.createDataFrame(
            [], "endpoint string, request_method string, "
            "predicted_time double, actual_time double"
        )
    loaded = response_time.load(model_path)  # exercise S10 save/load
    preds = response_time.predict(
        loaded, features.feature_projection(_features_input(spark, sf_dir))
    )
    return preds


@query("rt_scoring_roundtrip")  # side-effecting sink — rows-only check
def rt_scoring_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A6/U7 end-to-end (reference response_time_prediction.py:206-223):
    train, score the predict projection, append to the
    response_time_predictions sink, read the warehouse table back. The
    wall-clock prediction_timestamp stamp is dropped from the returned
    frame; the test suite additionally asserts rmse() is finite."""
    import shutil
    import tempfile

    from nginx_analytics_spark import jobs
    from nginx_analytics_spark.ml import response_time
    from nginx_analytics_spark.sources.warehouse import Warehouse

    work = tempfile.mkdtemp(prefix="nas_rtscore_")
    try:
        model = response_time.train(
            features.training_features(
                _features_input(spark, sf_dir), order_key="event_id"
            ),
            model_path=f"{work}/model",
        )
        if model is None:  # below the 100-row reference gate
            return spark.createDataFrame(
                [], "endpoint string, request_method string, "
                "predicted_time double, actual_time double"
            )
        stored = jobs.score_and_store(
            response_time.load(f"{work}/model"),
            features.feature_projection(_features_input(spark, sf_dir)),
            Warehouse(spark, f"{work}/wh"),
        )
        out = stored.drop("prediction_timestamp")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# M6 (dedup / similarity / text / multimodal) queries register themselves on
# import — must stay the last statement so the decorator above is defined.
from nginx_analytics_spark import registry_dataops  # noqa: E402,F401
