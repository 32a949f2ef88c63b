#!/usr/bin/env python
"""Attribute per-query wall time from a Spark event log produced by
tools/bench_eventlog.py (jobs are labelled "bench:<query>").

For each requested query (default: the slowest 15 by summed job wall),
prints per-job and per-stage breakdowns: stage wall (submission →
completion), summed task executorRunTime / GC time / scheduler delay /
shuffle fetch wait / serialization, and the gap between job wall and
stage wall (driver-side time: planning, checkpoint round-trips, AQE).

Usage: python tools/eventlog_report.py <event_log_file> [query ...]
"""
from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    wanted = set(sys.argv[2:])

    jobs = {}  # job_id -> dict
    stages = {}  # stage_id -> dict
    stage_tasks = defaultdict(lambda: defaultdict(float))
    stage_task_count = defaultdict(int)

    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev.get("Submission Time", 0),
                    "t1": None,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:60],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                    "n_tasks": si.get("Number of Tasks"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                ti = ev.get("Task Info") or {}
                stage_task_count[sid] += 1
                stage_tasks[sid]["run"] += tm.get("Executor Run Time", 0)
                stage_tasks[sid]["gc"] += tm.get("JVM GC Time", 0)
                stage_tasks[sid]["deser"] += tm.get("Executor Deserialize Time", 0)
                stage_tasks[sid]["result_ser"] += tm.get("Result Serialization Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                stage_tasks[sid]["fetch_wait"] += srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                stage_tasks[sid]["shuf_write"] += swm.get("Shuffle Write Time", 0) / 1e6
                # scheduler delay = task wall - (deser + run + result ser + gettingResult)
                wall = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                delay = wall - tm.get("Executor Deserialize Time", 0) - tm.get(
                    "Executor Run Time", 0
                ) - tm.get("Result Serialization Time", 0)
                stage_tasks[sid]["sched_delay"] += max(0, delay)
                stage_tasks[sid]["wall"] += wall

    by_query = defaultdict(list)
    for jid, j in jobs.items():
        desc = j["desc"]
        q = desc[6:] if desc.startswith("bench:") else desc or "<none>"
        by_query[q].append(jid)

    totals = {
        q: sum((jobs[j]["t1"] or jobs[j]["t0"]) - jobs[j]["t0"] for j in js) / 1000.0
        for q, js in by_query.items()
    }
    if not wanted:
        wanted = {q for q, _ in sorted(totals.items(), key=lambda kv: -kv[1])[:15]}

    print(f"{'query':30s} {'jobs_wall_s':>10}")
    for q, tot in sorted(totals.items(), key=lambda kv: -kv[1]):
        mark = " *" if q in wanted else ""
        print(f"{q:30s} {tot:10.2f}{mark}")

    for q in sorted(wanted, key=lambda q: -totals.get(q, 0)):
        print(f"\n=== {q}: {totals.get(q, 0):.2f}s across {len(by_query.get(q, []))} jobs ===")
        for jid in by_query.get(q, []):
            j = jobs[jid]
            jwall = ((j["t1"] or j["t0"]) - j["t0"]) / 1000.0
            swall = 0.0
            rows = []
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if s is None or s["t0"] is None:
                    continue
                sw = (s["t1"] - s["t0"]) / 1000.0
                swall += sw
                m = stage_tasks[sid]
                rows.append(
                    f"    stage {sid:4d} wall {sw:6.2f}s tasks {stage_task_count[sid]:3d}"
                    f" run {m['run']/1000:7.1f}s gc {m['gc']/1000:5.1f}s"
                    f" delay {m['sched_delay']/1000:6.1f}s fetch {m['fetch_wait']/1000:5.1f}s"
                    f"  {s['name']}"
                )
            print(
                f"  job {jid:4d} wall {jwall:6.2f}s, stage-wall {swall:6.2f}s,"
                f" driver-gap {jwall - swall:6.2f}s"
            )
            for r in rows:
                print(r)


if __name__ == "__main__":
    main()
