"""Stream-stream interval join boundary semantics (X42,
streaming/joins.py) — a crafted micro-fixture pins the inclusive
[click, click+1h] window, cross-user isolation, and multi-match
emission that the fixture-level oracle can't isolate."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from nginx_analytics_spark.streaming.joins import (
    run_click_purchase_join_available_now,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type)"""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    sf_dir = str(tmp_path / "sf_join")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_interval_join_boundaries_and_isolation(spark, tmp_path):
    h = dt.timedelta(hours=1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, T0, 1, "click"),
        (2, T0, 1, "purchase"),            # exactly at click -> included
        (3, T0 + h, 1, "purchase"),        # exactly +1h -> included
        (4, T0 + h + s, 1, "purchase"),    # beyond window -> excluded
        (5, T0 - s, 1, "purchase"),        # before click -> excluded
        (6, T0 + s, 2, "purchase"),        # other user -> excluded
        (7, T0 + s, 3, "click"),           # click with no purchases
    ]
    sf_dir = _write_events(tmp_path, rows)
    got = sorted(
        (r["user_id"], r["purchase_ts"])
        for r in run_click_purchase_join_available_now(spark, sf_dir).collect()
    )
    assert got == [(1, T0), (1, T0 + h)]


def test_interval_join_multi_click_multi_purchase(spark, tmp_path):
    m = dt.timedelta(minutes=10)
    rows = [
        (1, T0, 1, "click"),
        (2, T0 + m, 1, "click"),           # overlapping second click
        (3, T0 + 2 * m, 1, "purchase"),    # matches BOTH clicks
    ]
    sf_dir = _write_events(tmp_path, rows)
    got = sorted(
        (r["click_ts"], r["purchase_ts"])
        for r in run_click_purchase_join_available_now(spark, sf_dir).collect()
    )
    assert got == [(T0, T0 + 2 * m), (T0 + m, T0 + 2 * m)]
