"""Full-registry AQE FINAL-plan census at sf0.01 (round-workflow
standing step; committed as a repo script in r16 — earlier rounds ran
it from /tmp, which made the methodology unreviewable).

For every registered query: build the DataFrame, collect() it, then
read that query's OWN QueryExecution's EXECUTED plan — the AQE final
plan, not the initial one — and count CartesianProduct /
BroadcastNestedLoopJoin / executed SortMergeJoin nodes. The r15 round
corrected a long-standing counting bug here: `executedPlan().toString()`
on an AdaptiveSparkPlan prints BOTH the final and initial plan
sections ("== Initial Plan =="), and counting the whole string counts
joins AQE replaced at runtime — 6 of the historical "8 by-design SMJs"
were initial-plan artifacts. This script truncates at the initial-plan
marker so only executed operators are counted.

Output: one line per query with nonzero counts, then a summary dict.
Exit 0 always (the census is a report; the adjudication of "by-design"
vs "defect" is SCALING.md's job).

Usage: python scripts/plan_census.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

# runnable from anywhere: the repo root is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def final_plan(df) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    cut = s.find("== Initial Plan ==")
    return s if cut < 0 else s[:cut]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from nginx_analytics_spark import registry
    from nginx_analytics_spark.session import get_spark

    spark = get_spark(
        app_name="plan_census", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    errors: list[str] = []
    totals = {"CartesianProduct": 0, "BroadcastNestedLoopJoin": 0,
              "SortMergeJoin": 0}
    flagged: list[tuple[str, dict]] = []
    t0 = time.monotonic()
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            df.collect()
            plan = final_plan(df)
        except Exception as e:  # noqa: BLE001 — census must finish
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        counts = {k: plan.count(k) for k in totals}
        # BNLJ nodes also contain no "CartesianProduct" substring; the
        # two are counted independently on purpose (a declared tiny-
        # aggregate BNLJ is fine, a cartesian never is).
        if any(counts.values()):
            flagged.append((name, counts))
            for k, v in counts.items():
                totals[k] += v
    for name, counts in flagged:
        print(f"{name}: " + ", ".join(f"{k}={v}" for k, v in counts.items() if v))
    print({
        "queries": len(qs),
        "errors": len(errors),
        "wall_s": round(time.monotonic() - t0, 1),
        **{f"total_{k}": v for k, v in totals.items()},
    })
    for e in errors:
        print("ERROR", e)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
