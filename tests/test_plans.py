"""Physical-plan hygiene: the scale properties the engine promises are
asserted here, not just documented — broadcast joins where intended,
filters pushed to the parquet scans, no accidental cartesian products.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from nginx_analytics_spark import registry

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, op: str) -> int:
    """Count operator nodes in the plan tree (formatted output also repeats
    each node in a detail section — match the 'Op (id)' tree form only)."""
    import re

    return len(re.findall(rf"{op} \(\d+\)", plan))


def test_shipping_priority_joins_broadcast_and_pushdown(spark):
    p = plan_of(registry.queries()["shipping_priority"](spark, SF))
    assert "SortMergeJoin" not in p  # filtered dims must broadcast
    assert "BroadcastHashJoin" in p
    # all three table filters reach the scans
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in p
    assert "GreaterThan(l_shipdate" in p
    assert "LessThan(o_orderdate" in p


def test_pricing_summary_pushdown(spark):
    p = plan_of(registry.queries()["pricing_summary"](spark, SF))
    assert "LessThanOrEqual(l_shipdate" in p
    assert "CartesianProduct" not in p


def test_anomaly_chain_no_cartesian(spark):
    p = plan_of(registry.queries()["anomaly_detail"](spark, SF))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_parse_enrich_is_scan_plus_project_only(spark):
    """The canonical ingest transform must stay a shuffle-free map stage."""
    p = plan_of(registry.queries()["parse_enrich"](spark, SF))
    assert "Exchange" not in p


def test_clean_corpus_single_exchange(spark):
    """All cleaning gates (language, quality, length) must fuse into the
    scan; the only shuffle is the dedup window."""
    p = plan_of(registry.queries()["clean_corpus"](spark, SF))
    assert n_nodes(p, "Exchange") == 1, p
    assert "Join" not in p  # stages compose as expressions, not joins


def test_asof_join_no_range_explosion(spark):
    """The as-of query must plan as union + window — never a join on the
    time axis (no sort-merge/nested-loop/cartesian between the sides)."""
    p = plan_of(registry.queries()["asof_last_purchase"](spark, SF))
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Union" in p and "Window" in p


def test_bounded_topk_truncates_before_exchange(spark):
    """The Arrow truncation stage must sit upstream of the window's
    exchange in the physical plan."""
    p = plan_of(registry.queries()["top_endpoints_bounded"](spark, SF))
    assert n_nodes(p, "MapInPandas") == 1
    assert n_nodes(p, "Exchange") == 1


def test_latency_percentiles_partial_aggregation(spark):
    """The sketch variant must plan partial (map-side) aggregation — the
    mergeability claim that makes it the 100 TB path."""
    p = plan_of(registry.queries()["latency_percentiles_approx"](spark, SF))
    assert "partial" in p.lower()
    assert n_nodes(p, "Exchange") == 1


def test_local_supplier_volume_dims_broadcast(spark):
    """Q5 shape: the region->nation->supplier chain and the dims frame
    must broadcast; the only shuffle joins are on the fact keys, and the
    region filter reaches its scan."""
    p = plan_of(registry.queries()["local_supplier_volume"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "EqualTo(r_name,ASIA)" in p
    assert "GreaterThanOrEqual(o_orderdate" in p


def test_returned_items_pushdown_and_broadcast(spark):
    """Q10 shape: the returnflag predicate must hit the lineitem scan and
    nation must broadcast."""
    p = plan_of(registry.queries()["returned_items"](spark, SF))
    assert "EqualTo(l_returnflag,R)" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_contamination_no_shuffle_on_train_side(spark):
    """The decontamination join must be broadcast (bench set), keeping
    the 100 TB training side shuffle-free up to the per-doc agg."""
    p = plan_of(registry.queries()["contamination_check"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pack_chunks_single_window_exchange(spark):
    """The packing plan is one window over the group partitioning — a
    single exchange, no joins."""
    p = plan_of(registry.queries()["pack_chunks"](spark, SF))
    assert n_nodes(p, "Exchange") == 1, p
    assert "Join" not in p


def test_pii_redaction_shuffle_free(spark):
    """PII redaction is a pure map — no KEYED exchange anywhere (the
    scale invariant: nothing groups, joins, or sorts). The one exchange
    allowed is the r16 scale-adaptive scan fan-out — a RoundRobin
    repartition of the single-split local fixture scan that never fires
    at scale (sources/readers._fan_out_small_scan; measured ×2.5 on the
    regex stage at sf0.1)."""
    p = plan_of(registry.queries()["pii_redaction"](spark, SF))
    assert "Exchange hashpartitioning" not in p
    assert "Exchange rangepartitioning" not in p
    assert n_nodes(p, "Exchange") <= 1  # the fan-out only
    assert "Join" not in p


def test_temperature_sample_broadcasts_rates(spark):
    """The rate frame joins broadcast; the corpus side never shuffles."""
    p = plan_of(registry.queries()["temperature_sample_docs"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_forecast_revenue_full_pushdown_no_shuffle(spark):
    """Q6 is the pure scan-agg: every predicate reaches the parquet scan
    and the only exchange is the 1-row final aggregate."""
    p = plan_of(registry.queries()["forecast_revenue"](spark, SF))
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "GreaterThan(l_discount" in p
    assert "LessThan(l_quantity" in p
    assert "Exchange hashpartitioning" not in p


def test_order_priority_check_semi_join_no_distinct(spark):
    """Q4's EXISTS must plan as a semi join (probe-once, no fact-side
    duplication) — never join+distinct."""
    p = plan_of(registry.queries()["order_priority_check"](spark, SF))
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_promo_revenue_broadcasts_part(spark):
    p = plan_of(registry.queries()["promo_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "GreaterThanOrEqual(l_shipdate" in p


def test_large_volume_customers_semi_join_and_broadcast_customer(spark):
    p = plan_of(registry.queries()["large_volume_customers"](spark, SF))
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_brand_size_revenue_pushes_disjunction_hulls(spark):
    """Q19's cross-table OR cannot push whole arms, but Catalyst must
    derive and push each table's residual hull (quantity range to
    lineitem, brand+size to part)."""
    p = plan_of(registry.queries()["brand_size_revenue"](spark, SF))
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p  # lineitem-side hull
    assert "EqualTo(p_brand,Brand#1)" in p  # part-side hull
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_idle_customers_anti_join_and_window_pushdown(spark):
    p = plan_of(registry.queries()["idle_customers"](spark, SF))
    assert "LeftAnti" in p
    assert "GreaterThanOrEqual(o_orderdate" in p  # window prunes orders scan
    assert "CartesianProduct" not in p


def test_volume_shipping_nation_filter_reaches_both_dims(spark):
    """Q7: the 2-value nation IN-filter must push into BOTH nation scans
    and every join must hash-build (no cartesian for the pair
    disjunction)."""
    p = plan_of(registry.queries()["volume_shipping"](spark, SF))
    assert p.count("In(n_name, [NATION_1,NATION_2])") == 2
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_small_quantity_revenue_brand_prunes_before_avg(spark):
    """Q17: the brand filter must reach the part scan, and the per-part
    avg must consume the broadcast-pruned lineitem (no full-fact agg)."""
    p = plan_of(registry.queries()["small_quantity_revenue"](spark, SF))
    assert "EqualTo(p_brand,Brand#7)" in p
    assert "BroadcastHashJoin" in p


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level shuffle pruning: a selective dimension filter
    must inject a bloom_filter_agg subquery whose might_contain()
    predicate drops non-joining fact rows BEFORE the fact side's shuffle
    — at 100 TB this is what keeps a selective SMJ from shuffling the
    whole fact table. Thresholds are set to the fixture's scale (the
    application side must look 'big' and broadcast must be off, as it
    would be for a fact-fact join)."""
    from pyspark.sql import functions as F

    from nginx_analytics_spark.sources import load_table

    saved = {}
    tune = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    for k, v in tune.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        p = plan_of(j)
        assert "might_contain" in p, p[:2000]
        assert "bloom_filter_agg" in p
        # the predicate guards the FACT (lineitem) scan side
        assert "might_contain" in p.split("Scan parquet")[1] or "l_orderkey" in [
            l for l in p.splitlines() if "might_contain" in l
        ][0]
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_handoff_adds_one_exchange(spark):
    """X67: the training hand-off composition stays shuffle-minimal.
    Sharding the curated corpus (X39 -> X49) must add EXACTLY ONE
    exchange over the curation DAG — the hash partition on ``shard`` —
    and the per-shard summary the registry exposes must add ZERO more
    (it aggregates within the partitioning the window just established).
    Any second exchange here would mean the composition re-shuffles the
    corpus it just placed."""
    from nginx_analytics_spark.operators import curation, export
    from nginx_analytics_spark import registry
    from nginx_analytics_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    curated = curation.curate_documents(docs)
    base = n_nodes(plan_of(curated), "Exchange")
    manifest = export.shard_assignments(curated, "doc_id", 8)
    assert n_nodes(plan_of(manifest), "Exchange") == base + 1
    handoff = registry.queries()["training_handoff"](spark, SF)
    assert n_nodes(plan_of(handoff), "Exchange") == base + 1


def test_tpch_completion_plan_hygiene(spark):
    """X66: the Q2/Q16/Q21 shapes keep their intended physical form —
    dimension chains broadcast, the NOT IN is a broadcast anti join, the
    Q21 EXISTS/NOT EXISTS pair lowers to semi + anti joins, and no shape
    degenerates to a cartesian product."""
    q = registry.queries()
    p2 = plan_of(q["min_cost_supplier"](spark, SF))
    assert "CartesianProduct" not in p2
    assert "BroadcastHashJoin" in p2
    # r5 verdict item 4: the part filter prunes the BIG side BEFORE the
    # per-(part, supplier) aggregate — the broadcast LeftSemi against the
    # filtered part keys must sit BELOW the first HashAggregate (formatted
    # ids grow bottom-up within a branch), and the p_size/p_type predicates
    # must reach the part scan as pushed filters.
    import re

    semi_ids = [int(i) for i in re.findall(r"BroadcastHashJoin LeftSemi BuildRight \((\d+)\)", p2)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", p2)]
    assert semi_ids and agg_ids and min(semi_ids) < min(agg_ids)
    assert "LessThanOrEqual(p_size,15)" in p2
    assert "EqualTo(p_type,STANDARD)" in p2

    p16 = plan_of(q["supplier_part_counts"](spark, SF))
    assert "CartesianProduct" not in p16
    assert "BroadcastHashJoin LeftAnti BuildRight" in p16  # NOT IN -> broadcast anti
    # part predicates reach the scan
    assert "Not(EqualTo(p_brand,Brand#1))" in p16

    p21 = plan_of(q["waiting_suppliers"](spark, SF))
    assert "CartesianProduct" not in p21
    assert "LeftSemi" in p21  # EXISTS
    assert "LeftAnti" in p21  # NOT EXISTS


def test_multi_branch_shapes_reuse_fact_exchange_at_runtime(spark):
    """The TPC-H shapes whose SQL references the same fact subplan from
    two branches (Q11's scalar threshold over its own aggregate, Q20's
    per-supplier share vs global share, Q21's semi/anti pair) must not
    pay the fact twice: AQE's exchange reuse dedups the shared shuffle
    AT RUNTIME (the static formatted plan prints both branches in full,
    which is why this asserts on the executed plan after an action)."""
    for name in ("important_parts", "dominant_suppliers", "waiting_suppliers"):
        df = registry.queries()[name](spark, SF)
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        final = executed.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in executed, name
        assert "ReusedExchange" in final, name


def _shuffle_records_written(df) -> dict[str, list[int]]:
    """Execute df and read each shuffle's records-written metric from
    the AQE final physical plan — the direct evidence for 'this
    exchange carries N rows', not an inference from the plan shape."""
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    out: dict[str, list[int]] = {}

    def walk(n):
        name = n.nodeName()
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleRecordsWritten":
                out.setdefault(name, []).append(int(kv._2().value()))
        if "QueryStage" in name or name == "AdaptiveSparkPlan":
            walk(n.plan() if "QueryStage" in name else n.executedPlan())
            return
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(node)
    return out


def test_weighted_sample_global_mode_exchange_bounded(spark):
    """r14 verdict item 4: weighted_sample_wor with group_col=None
    funnels through ONE window partition — but Catalyst's
    InferWindowGroupLimit collapses the rank-filtered single-partition
    window into TakeOrderedAndProject, whose shuffle moves each input
    partition's local top-k only. The metric is the proof: on a 10k-row
    8-partition frame with k=5, every shuffle in the plan writes at
    most k x n_partitions = 40 records — the corpus never rides the
    funnel. (The measured JVM-vs-Arrow comparison that decided against
    a manual partition_topk pre-truncation stage is in SCALING.md r15.)
    """
    from pyspark.sql import functions as F

    from nginx_analytics_spark.operators import sampling

    df = spark.range(0, 10_000, 1, 8).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(97)) + 1).cast("double").alias("w"),
    )
    out = sampling.weighted_sample_wor(df, "doc_id", "w", 5)
    recs = _shuffle_records_written(out)
    assert recs, "expected at least one bounded shuffle in the plan"
    flat = [v for vals in recs.values() for v in vals]
    assert max(flat) <= 5 * 8, recs
    assert out.count() == 5


def test_weighted_sample_grouped_window_group_limit(spark):
    """Grouped mode: the rank filter plans a PARTIAL WindowGroupLimit
    upstream of the window exchange, so each input partition forwards
    at most k rows per group — the exchange writes at most
    groups x k x n_partitions records even when one group holds almost
    the whole frame (the skewed-crawl case the r14 verdict named)."""
    from pyspark.sql import functions as F

    from nginx_analytics_spark.operators import sampling

    # skew: group 0 holds ~94% of rows
    df = spark.range(0, 10_000, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 9_400, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(7)))
        .alias("grp"),
        (F.pmod(F.col("id"), F.lit(97)) + 1).cast("double").alias("w"),
    )
    out = sampling.weighted_sample_wor(df, "doc_id", "w", 5, group_col="grp")
    p = plan_of(out)
    assert n_nodes(p, "WindowGroupLimit") == 2  # partial below, final above
    recs = _shuffle_records_written(out)
    flat = [v for vals in recs.values() for v in vals]
    assert flat and max(flat) <= 7 * 5 * 8, recs


def test_per_group_sample_window_group_limit(spark):
    """The uniform twin rides the same rewrite: partial WindowGroupLimit
    before the exchange, bounded shuffle on a skewed frame."""
    from pyspark.sql import functions as F

    from nginx_analytics_spark.operators import sampling

    df = spark.range(0, 10_000, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 9_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("grp"),
    )
    out = sampling.per_group_sample(df, "grp", "doc_id", 4)
    p = plan_of(out)
    assert n_nodes(p, "WindowGroupLimit") == 2
    recs = _shuffle_records_written(out)
    flat = [v for vals in recs.values() for v in vals]
    assert flat and max(flat) <= 2 * 4 * 8, recs
    assert out.count() == 8
