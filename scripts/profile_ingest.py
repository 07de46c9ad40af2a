"""Per-JOB breakdown of the X80 dedup-ingest (or X85 embedding-ingest)
micro-batch loop (guide §1 measure first; r16 verdict item 1: the
steady-state batch wall is scheduling-bound across many small jobs —
count them before cutting them).

Runs the REAL bench child (``run_dedup_ingest_throughput`` /
``run_embedding_ingest_throughput``) in THIS process with the Spark
event log enabled, then prints one row per Spark job: submission wall,
job wall, gap since the previous job's completion (pure driver/
scheduling time), stage count, task count, summed executor run ms, and
the result-stage name head (which names the action — count, parquet
write, localCheckpoint runJob, ...).

Usage: python scripts/profile_ingest.py [dedup|embedding] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    kind = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    log_dir = tempfile.mkdtemp(prefix="nas_ingest_eventlog_")
    try:
        # get_spark reads no eventlog conf; build the session FIRST with
        # the eventlog on, the bench child then getOrCreate()s into it.
        from nginx_analytics_spark.session import get_spark

        get_spark(
            app_name=f"profile_ingest_{kind}",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": log_dir,
                "spark.eventLog.compress": "false",
            },
        )
        import bench

        if kind == "dedup":
            out = bench.run_dedup_ingest_throughput(
                sf_dir, cpus, n_batches=n_batches
            )
        else:
            out = bench.run_embedding_ingest_throughput(
                sf_dir, cpus, replicate=10
            )
        print(json.dumps(out))

        logs = [
            os.path.join(log_dir, f)
            for f in os.listdir(log_dir)
            if not f.startswith(".")
        ]
        path = max(logs, key=os.path.getmtime)
        if os.path.isdir(path):
            parts = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.startswith("events_")
            )
        else:
            parts = [path]
        jobs: dict[int, dict] = {}
        stage_metrics: dict[int, dict] = {}
        stage_to_job: dict[int, int] = {}
        for part in parts:
            with open(part) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    k = ev.get("Event")
                    if k == "SparkListenerJobStart":
                        jid = ev["Job ID"]
                        infos = ev.get("Stage Infos", [])
                        head = ""
                        if infos:
                            head = max(infos, key=lambda s: s["Stage ID"]).get(
                                "Stage Name", ""
                            )
                        desc = ev.get("Properties", {}).get(
                            "spark.job.description", ""
                        )
                        jobs[jid] = {
                            "job": jid,
                            "t0": ev.get("Submission Time", 0),
                            "t1": 0,
                            "stages": len(infos),
                            "tasks": sum(
                                s.get("Number of Tasks", 0) for s in infos
                            ),
                            "name": (desc or head)[:70],
                            "desc": desc,
                            "run_ms": 0,
                        }
                        for s in infos:
                            stage_to_job[s["Stage ID"]] = jid
                    elif k == "SparkListenerJobEnd":
                        if ev["Job ID"] in jobs:
                            jobs[ev["Job ID"]]["t1"] = ev.get(
                                "Completion Time", 0
                            )
                    elif k == "SparkListenerTaskEnd":
                        sid = ev["Stage ID"]
                        m = ev.get("Task Metrics") or {}
                        jid = stage_to_job.get(sid)
                        if jid is not None:
                            jobs[jid]["run_ms"] += m.get(
                                "Executor Run Time", 0
                            )

        ordered = [jobs[j] for j in sorted(jobs)]
        print(
            f"\n{'job':>4} {'wall_ms':>8} {'gap_ms':>7} {'stg':>4} "
            f"{'tasks':>6} {'run_ms':>8}  result-stage"
        )
        prev_end = None
        total_wall = total_gap = 0
        for j in ordered:
            wall = j["t1"] - j["t0"] if j["t1"] else -1
            gap = j["t0"] - prev_end if prev_end is not None else 0
            prev_end = j["t1"] or j["t0"]
            total_wall += max(wall, 0)
            total_gap += max(gap, 0)
            print(
                f"{j['job']:>4} {wall:>8} {gap:>7} {j['stages']:>4} "
                f"{j['tasks']:>6} {j['run_ms']:>8}  {j['name']}"
            )
        print(
            f"\njobs={len(ordered)} sum_job_wall={total_wall / 1e3:.2f}s "
            f"sum_inter_job_gap={total_gap / 1e3:.2f}s "
            f"(gap = driver-side planning/scheduling between jobs)"
        )
        # per-description rollup (phases labeled via setJobDescription)
        by_desc: dict[str, list] = {}
        prev_end = None
        for j in ordered:
            wall = max(j["t1"] - j["t0"], 0) if j["t1"] else 0
            gap = max(j["t0"] - prev_end, 0) if prev_end is not None else 0
            prev_end = j["t1"] or j["t0"]
            d = j.get("desc", "") or "(unlabeled)"
            # strip per-batch ids so phases aggregate across batches
            import re

            d = re.sub(r"\bb\d+\b", "bN", d)
            row = by_desc.setdefault(d, [0, 0, 0, 0])
            row[0] += 1
            row[1] += wall
            row[2] += gap
            row[3] += j["run_ms"]
        print(f"\n{'n':>4} {'wall_ms':>8} {'gap_ms':>8} {'run_ms':>8}  phase")
        for d, (n, w, g, r) in sorted(
            by_desc.items(), key=lambda kv: -(kv[1][1] + kv[1][2])
        ):
            print(f"{n:>4} {w:>8} {g:>8} {r:>8}  {d[:60]}")
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
