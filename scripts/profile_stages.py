"""Per-stage breakdown of one or more benched queries (guide §1/§7).

The bench UI is disabled, so the empirical loop ("which stage is slow,
is it compute or shuffle") runs off the Spark EVENT LOG instead: a
fresh session with ``spark.eventLog.enabled`` runs each named query
into the noop sink twice (warm-up + measured, matching the bench's
best-of discipline), then the event log is parsed into per-stage rows:

  stage id, name head, #tasks, executor run ms (sum), executor CPU ms,
  shuffle read/write bytes+ms, input bytes, JVM GC ms, wall span

Output: a text report per query on stdout. This is a measurement tool;
it never changes what a query computes.

Usage: python scripts/profile_stages.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_eventlog(path: str) -> list[dict]:
    """Stage rows from one event-log file (uncompressed JSON lines).
    Spark 4 rolling logs are a DIRECTORY of events_* part files."""
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]
    stages: dict[int, dict] = {}
    jobs: dict[int, dict] = {}
    for part in parts:
        _parse_one(part, stages, jobs)
    for j in jobs.values():
        for sid in j["stages"]:
            if sid in stages:
                stages[sid].setdefault("job_desc", j["desc"])
    return [stages[k] for k in sorted(stages)]


def _parse_one(path: str, stages: dict, jobs: dict) -> None:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(
                    sid,
                    {
                        "stage": sid,
                        "name": si.get("Stage Name", "")[:80],
                        "tasks": si.get("Number of Tasks", 0),
                        "run_ms": 0,
                        "cpu_ms": 0,
                        "gc_ms": 0,
                        "sr_bytes": 0,
                        "sr_wait_ms": 0,
                        "sw_bytes": 0,
                        "sw_ms": 0,
                        "in_bytes": 0,
                        "wall_ms": 0,
                    },
                )
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    st["wall_ms"] = comp - sub
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(
                    sid,
                    {
                        "stage": sid,
                        "name": "",
                        "tasks": 0,
                        "run_ms": 0,
                        "cpu_ms": 0,
                        "gc_ms": 0,
                        "sr_bytes": 0,
                        "sr_wait_ms": 0,
                        "sw_bytes": 0,
                        "sw_ms": 0,
                        "in_bytes": 0,
                        "wall_ms": 0,
                    },
                )
                st["run_ms"] += m.get("Executor Run Time", 0)
                st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                st["gc_ms"] += m.get("JVM GC Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                st["sr_bytes"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                st["sr_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                st["sw_bytes"] += sw.get("Shuffle Bytes Written", 0)
                st["sw_ms"] += sw.get("Shuffle Write Time", 0) // 1_000_000
                im = m.get("Input Metrics") or {}
                st["in_bytes"] += im.get("Bytes Read", 0)
    for j in jobs.values():
        for sid in j["stages"]:
            if sid in stages:
                stages[sid].setdefault("job_desc", j["desc"])
    return [stages[k] for k in sorted(stages)]


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_stages.py <query> [query ...]")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from nginx_analytics_spark import registry
    from nginx_analytics_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="nas_eventlog_")
    try:
        spark = get_spark(
            app_name="profile_stages",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": log_dir,
                "spark.eventLog.compress": "false",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        qs = registry.queries()

        def run(name: str) -> float:
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        spans = {}
        run(names[0])  # session warm-up, untimed
        for name in names:
            run(name)  # per-query warm-up (bench reports best-of-N)
            spark.sparkContext.setJobDescription(f"QUERY:{name}")
            t0 = time.monotonic()
            wall = run(name)
            spark.sparkContext.setJobDescription(None)
            spans[name] = (t0, time.monotonic(), wall)
        spark.stop()

        logs = [
            os.path.join(log_dir, f)
            for f in os.listdir(log_dir)
            if not f.startswith(".")
        ]
        rows = parse_eventlog(max(logs, key=os.path.getmtime))
        # correlate stages to queries via the job description property
        for name in names:
            mine = [r for r in rows if r.get("job_desc") == f"QUERY:{name}"]
            wall = spans[name][2]
            print(f"\n=== {name}  wall={wall:.3f}s "
                  f"stages={len(mine)} ===")
            print(
                f"{'stage':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} "
                f"{'gc_s':>5} {'in_MB':>7} {'sr_MB':>7} {'sw_MB':>7} "
                f"{'wall_s':>7}  name"
            )
            for r in sorted(mine, key=lambda r: -r["run_ms"]):
                print(
                    f"{r['stage']:>5} {r['tasks']:>5} "
                    f"{r['run_ms'] / 1e3:>7.2f} {r['cpu_ms'] / 1e3:>7.2f} "
                    f"{r['gc_ms'] / 1e3:>5.2f} "
                    f"{r['in_bytes'] / 1e6:>7.1f} "
                    f"{r['sr_bytes'] / 1e6:>7.1f} "
                    f"{r['sw_bytes'] / 1e6:>7.1f} "
                    f"{r['wall_ms'] / 1e3:>7.2f}  {r['name'][:60]}"
                )
            tot_run = sum(r["run_ms"] for r in mine) / 1e3
            tot_wall = sum(r["wall_ms"] for r in mine) / 1e3
            print(
                f"TOTAL run={tot_run:.2f}s stage-wall-sum={tot_wall:.2f}s "
                f"(untracked driver/planning gap = "
                f"{wall - tot_wall:.2f}s)"
            )
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
