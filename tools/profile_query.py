"""Per-job profiler for one catalog entry (optimization guide §1).

Runs QUERIES[name] (warm: once untimed, then once timed) with the
Spark event log enabled, then parses the log to print each job's
wall-clock, stage breakdown (task time, shuffle read/write bytes,
rows), and Python-eval / exchange node counts from the final plans.

Usage: python tools/profile_query.py <query> [sf_dir] [--trials N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    trials = 2
    for a in sys.argv[1:]:
        if a.startswith("--trials="):
            trials = int(a.split("=")[1])

    evdir = "/tmp/topn_profile_eventlog"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)

    from topn_spark.queries import QUERIES
    from topn_spark.session import get_session

    spark = get_session(
        app_name=f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    q = QUERIES[name]
    # warm: JIT/codegen/broadcast paths, then timed trials
    q.builder(spark, sf_dir).collect()
    spark.catalog.clearCache()
    best = float("inf")
    for t in range(trials):
        spark.sparkContext.setJobDescription(f"TIMED_{t}")
        t0 = time.perf_counter()
        q.builder(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"trial {t}: {dt:.3f}s")
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    print(f"\n=== {name}: best wall {best:.3f}s ===")
    path = os.path.join(evdir, app_id)
    if os.path.isdir(path):
        cands = [
            f for f in os.listdir(path)
            if f.startswith("events_")
        ]
        path = os.path.join(path, sorted(cands)[0])
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as fh:
        for ln in fh:
            try:
                ev = json.loads(ln)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev["Stage Infos"]
                    ],
                    "ngroups": ev.get("Stage Infos") and len(ev["Stage Infos"]),
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                }

    total_timed = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = (j["t1"] - j["t0"]) / 1000.0
        timed = j["desc"].startswith("TIMED_")
        if j["desc"] == "TIMED_0":
            total_timed += wall
        if not timed:
            continue
        if not j["desc"].startswith("TIMED_0"):
            continue
        print(f"job {jid:3d} {wall:7.3f}s  desc={j['desc']}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s is None:
                print(f"    stage {sid} (skipped)")
                continue
            print(
                f"    stage {sid:4d} {s['ms']/1000:7.3f}s "
                f"{s['tasks']:4d} tasks  {s['name']}"
            )
    print(f"sum of TIMED_0 job walls: {total_timed:.3f}s "
          f"(gap vs wall = driver/python time)")


if __name__ == "__main__":
    main()
