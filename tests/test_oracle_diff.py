"""Differential tests: every registered oracle query must match DuckDB
exactly at sf0.001 (fast tier; the driver gate runs sf0.01 — covered by
the slow marker below when SPARK_GRAFT_FULL=1)."""

from __future__ import annotations

import os

import pytest

from nginx_analytics_spark import registry
from tests.oracle_harness import duckdb_connection, run_query_pair

SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"

ORACLES = registry.oracle_sql()
QUERIES = registry.queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match_sf0001(spark, con, name):
    _, _, problems = run_query_pair(
        spark, con, QUERIES[name], ORACLES[name], SF_SMALL
    )
    assert not problems, f"{name}: {problems}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL"), reason="set SPARK_GRAFT_FULL=1"
)
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match_sf001(spark, name):
    c = duckdb_connection(SF_GATE)
    try:
        _, _, problems = run_query_pair(
            spark, c, QUERIES[name], ORACLES[name], SF_GATE
        )
        assert not problems, f"{name}: {problems}"
    finally:
        c.close()


def test_every_query_runs(spark):
    """Queries without oracles still must execute and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
