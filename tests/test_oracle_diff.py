"""Differential tests: every registered oracle query must match DuckDB
exactly at sf0.001 (fast tier) AND at sf0.01 (the driver gate's scale —
on by default, opt out with SPARK_GRAFT_FAST=1)."""

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


# The sf0.01 tier mirrors the driver's CORRECTNESS gate scale. It runs BY
# DEFAULT (r2 verdict item 7: the gate comparison must run every round);
# set SPARK_GRAFT_FAST=1 to skip it during tight inner-loop iteration.
@pytest.mark.skipif(
    bool(os.environ.get("SPARK_GRAFT_FAST")), reason="SPARK_GRAFT_FAST set"
)
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match_sf001(spark, gate_con, name):
    _, _, problems = run_query_pair(
        spark, gate_con, QUERIES[name], ORACLES[name], SF_GATE
    )
    assert not problems, f"{name}: {problems}"


@pytest.fixture(scope="module")
def gate_con():
    c = duckdb_connection(SF_GATE)
    yield c
    c.close()


def test_no_bare_round_in_oracle_sql():
    """Lint: DuckDB's round() half-even/half-up behavior diverges from
    Spark's on ties, so every oracle must use the floor(x*1e6+0.5)/1e6
    convention (half_up_sql / R6_SQL) — reject bare round( so the
    convention can't silently regress."""
    import re

    offenders = {
        name for name, sql in ORACLES.items()
        if re.search(r"\bround\s*\(", sql, re.IGNORECASE)
    }
    assert not offenders, f"bare round() in oracle SQL: {sorted(offenders)}"


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
