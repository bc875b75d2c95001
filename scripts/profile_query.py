"""Stage-level profiler for bench queries, via the Spark event log.

Usage: python scripts/profile_query.py <query> [query ...]

Runs each query once untimed (codegen warm) then once timed to a noop
sink inside a session with spark.eventLog.enabled, then parses the
event log: per-stage wall time, task time, shuffle read/write bytes,
records, and the stage's first line of callsite — the empirical loop of
guide §1 without the UI. Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    from eventstorm_spark.session import get_spark

    spark = get_spark("eventstorm_profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
    })
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from eventstorm_spark import inventory

    qs = dict(inventory.queries())
    for n, kw in bench.SCALE_FORMS.items():
        fn = qs[n]
        qs[n] = (lambda f, k: lambda spark, d: f(spark, d, **k))(fn, kw)

    names = sys.argv[1:]
    sc = spark.sparkContext
    marks = {}
    for name in names:
        bench.materialize(qs[name](spark, sf_dir))  # warm
        sc.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        bench.materialize(qs[name](spark, sf_dir))
        marks[name] = time.perf_counter() - t0
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # parse the event log (v2 layout: a directory of events_* files)
    root = glob.glob(os.path.join(EVDIR, f"*{app_id}*"))[0]
    if os.path.isdir(root):
        paths = sorted(glob.glob(os.path.join(root, "events_*")))
    else:
        paths = [root]
    jobs = {}          # jobId -> description
    stage_info = {}    # stageId -> dict
    stage_jobs = {}    # stageId -> jobId
    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "")
                jobs[ev["Job ID"]] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_jobs[sid] = ev["Job ID"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                st = stage_info.setdefault(sid, {
                    "name": "", "wall_ms": 0, "n_tasks": 0,
                    "task_ms": 0, "sh_read": 0, "sh_write": 0,
                    "in_bytes": 0, "rec_read": 0, "rec_written": 0})
                st["name"] = si.get("Stage Name", "")
                st["wall_ms"] = (comp - sub) if sub and comp else 0
                st["n_tasks"] = si.get("Number of Tasks", 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stage_info.get(sid)
                tm = ev.get("Task Metrics") or {}
                if st is None:
                    # task ends can precede stage completion
                    st = stage_info.setdefault(sid, {
                        "name": "", "wall_ms": 0, "n_tasks": 0,
                        "task_ms": 0, "sh_read": 0, "sh_write": 0,
                        "in_bytes": 0, "rec_read": 0, "rec_written": 0})
                st["task_ms"] += tm.get("Executor Run Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["sh_read"] += (srm.get("Remote Bytes Read", 0)
                                  + srm.get("Local Bytes Read", 0))
                st["rec_read"] += srm.get("Total Records Read", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sh_write"] += swm.get("Shuffle Bytes Written", 0)
                st["rec_written"] += swm.get("Shuffle Records Written", 0)
                im = tm.get("Input Metrics") or {}
                st["in_bytes"] += im.get("Bytes Read", 0)

    for name in names:
        print(f"\n=== {name}  (timed run {marks[name]:.3f}s) ===")
        rows = []
        for sid, st in sorted(stage_info.items()):
            jid = stage_jobs.get(sid)
            if jobs.get(jid, "") != f"PROFILE:{name}":
                continue
            rows.append((sid, st))
        tot = sum(st["wall_ms"] for _, st in rows)
        print(f"{len(rows)} stages, {tot} ms stage-wall total "
              f"(overlap possible); jobs: "
              f"{len({stage_jobs[s] for s, _ in rows})}")
        for sid, st in rows:
            print(f"  stage {sid:>4} wall={st['wall_ms']:>6}ms "
                  f"task={st['task_ms']:>7}ms n={st['n_tasks']:>3} "
                  f"shR={st['sh_read']:>9} shW={st['sh_write']:>9} "
                  f"recR={st['rec_read']:>8} recW={st['rec_written']:>8} "
                  f"in={st['in_bytes']:>9}  {st['name'][:60]}")


if __name__ == "__main__":
    main()
