"""Per-Spark-job timing breakdown of a declared query (guide §1).

Usage: python3 tools/job_profile.py <sf_dir> <query> [runs]

Runs the query with the event log enabled and prints, for each Spark
job of the LAST run (warm), its wall duration, description/callsite,
and summed task time, so a many-job composite (flagship pipelines,
crawl_shards) can be attributed stage by stage. The first run warms
codegen/caches; only the post-warm run's jobs are attributed.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from cs533_big_data_data_mining_spark.session import get_spark  # noqa: E402


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    log_dir = "/tmp/spark-events-profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    mod = load_entry()
    qs = mod.queries()
    fn = qs[name]
    spark = get_spark(
        app_name=f"job_profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # warm the session the same way bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    marks = []
    for r in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        t1 = time.time()
        marks.append((t0, t1))
        print(f"run {r}: {t1 - t0:.3f}s")
    spark.stop()

    # parse the event log: keep jobs submitted inside the LAST run
    evs = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if "appstatus" not in f:
                paths.append(os.path.join(root, f))
    for p in paths:
        with open(p) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") in (
                    "SparkListenerJobStart",
                    "SparkListenerJobEnd",
                    "SparkListenerStageCompleted",
                ):
                    evs.append(e)
    lo, hi = marks[-1]
    lo_ms, hi_ms = lo * 1000 - 50, hi * 1000 + 50
    jobs = {}
    stage_to_job = {}
    for e in evs:
        if e["Event"] == "SparkListenerJobStart":
            ts = e["Submission Time"]
            if not (lo_ms <= ts <= hi_ms):
                continue
            jid = e["Job ID"]
            props = e.get("Properties") or {}
            desc = props.get("spark.job.description") or props.get(
                "callSite.short", ""
            )
            jobs[jid] = {
                "start": ts,
                "desc": desc[:150],
                "end": None,
                "task_ms": 0,
                "stages": 0,
                "sdetail": [],
            }
            for sid in e.get("Stage IDs", []):
                stage_to_job[sid] = jid
    for e in evs:
        if e["Event"] == "SparkListenerJobEnd" and e["Job ID"] in jobs:
            jobs[e["Job ID"]]["end"] = e.get("Completion Time")
        elif e["Event"] == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            jid = stage_to_job.get(si["Stage ID"])
            if jid in jobs and si.get("Completion Time") and si.get("Submission Time"):
                jobs[jid]["stages"] += 1
                jobs[jid]["sdetail"].append(
                    (
                        si["Stage ID"],
                        si.get("Number of Tasks", 0),
                        (si["Completion Time"] - si["Submission Time"]) / 1000.0,
                        (si.get("Stage Name") or "")[:60],
                    )
                )

    print(f"\n=== jobs in last run of {name} (wall {hi - lo:.3f}s) ===")
    total = 0.0
    items = sorted(jobs.items())
    prev_end = None
    for jid, j in items:
        dur = ((j["end"] or j["start"]) - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["end"] or j["start"]
        total += dur
        print(f"job {jid:4d}  {dur:7.3f}s  gap {gap:6.3f}s  [{j['stages']:2d} st]  {j['desc']}")
        if dur >= 0.75:
            for sid, ntask, sdur, sname in sorted(j["sdetail"], key=lambda x: -x[2])[:4]:
                print(f"        stage {sid:4d}  {sdur:7.3f}s  {ntask:4d} tasks  {sname}")
    print(f"sum of job durations: {total:.3f}s over {len(items)} jobs "
          f"(driver/plan time = wall - overlapping sum)")


if __name__ == "__main__":
    main()
