"""bench.py contract lints — no Spark session needed."""

from __future__ import annotations

import json
import subprocess
import sys


def test_bench_queries_all_registered():
    import bench

    from nginx_analytics_spark import registry

    registered = set(registry.queries())
    missing = [q for q in bench.BENCH_QUERIES if q not in registered]
    assert not missing, f"bench names not in registry: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES), "dupes"


def test_bench_covers_every_oracle_matched_query():
    """Every hash-checked query should be benchmarked unless it is one of
    the documented side-effecting/harness exclusions (bench.py docstring)."""
    import bench

    from nginx_analytics_spark import registry

    excluded = {
        # streaming/side-effecting harnesses + ML fits (see bench.py)
        "windowed_events",
        "sliding_windowed_events",
        "session_windows",
        "streaming_ingest_roundtrip",
        "anomaly_job_roundtrip",
        "stream_stream_join",
        "stream_stream_left_join",
        "rt_model_predictions",
        "rt_scoring_roundtrip",
        "parse_enrich_smoke",
        # deliberately-naive O(n^2) verification twin of the LSH path —
        # benching it would measure the strawman, not the engine
        "embedding_dedup_pairs",
    }
    benched = set(bench.BENCH_QUERIES)
    gaps = [
        q for q in registry.oracle_sql() if q not in benched and q not in excluded
    ]
    assert not gaps, f"oracle-matched queries missing from bench: {gaps}"
