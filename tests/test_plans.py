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
