#!/usr/bin/env python
"""Per-query Spark JOB breakdown via the UI REST API: run one builder,
then list every job it submitted (description, duration, stages) — the
measure-first tool for queries whose build() runs many actions
(snapshot commits, iterative algorithms, streaming replays).

    python scripts/job_profile.py <sf_dir> q_name [runs]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import __spark_entry__ as e
from dbt_lab_spark.session import get_spark

SF = sys.argv[1]
name = sys.argv[2]
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

spark = get_spark(app_name=f"job-profile-{name}",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
qs = e.queries()
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId


def jobs_after(jid0: int):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded") as r:
        js = json.load(r)
    out = [j for j in js if j["jobId"] > jid0]
    out.sort(key=lambda j: j["jobId"])
    return out


def max_jid():
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        js = json.load(r)
    return max((j["jobId"] for j in js), default=-1)


last = None
for i in range(runs):
    j0 = max_jid()
    t0 = time.perf_counter()
    df = qs[name](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jl = jobs_after(j0)
    print(f"== run {i}: wall {wall:.2f}s, {len(jl)} jobs ==", flush=True)
    last = (wall, jl)

wall, jl = last
tot = 0.0
for j in jl:
    from datetime import datetime
    st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
    ct = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
    dur = (ct - st).total_seconds()
    tot += dur
    desc = (j.get("description") or j["name"])[:95]
    print(f"  job {j['jobId']:4d} {dur:6.3f}s  tasks={j['numTasks']:4d}  {desc}")
print(f"sum job durations: {tot:.2f}s of wall {wall:.2f}s (gap = driver-side/log I/O)")
spark.stop()
