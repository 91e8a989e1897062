#!/usr/bin/env python
"""Capture .explain('formatted') for a set of queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
files (judge checks plan claims against these).

    python scripts/capture_plans.py <suffix> <sf_dir> q_a,q_b,...

Runs build() (which for the replay-driven queries executes the query)
and explains the returned DataFrame.  Output: plans/r10/.
"""
import io
import os
import sys
import time
import contextlib

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import __spark_entry__ as e
from dbt_lab_spark.session import get_spark

suffix = sys.argv[1]
SF = sys.argv[2]
names = [n for n in sys.argv[3].split(",") if n]

spark = get_spark(app_name=f"plan-capture-{suffix}",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
qs = e.queries()
outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r11"))
os.makedirs(outdir, exist_ok=True)
for name in names:
    t0 = time.time()
    try:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
    except Exception as ex:
        txt = f"ERROR {type(ex).__name__}: {ex}\n"
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(f"# {name} ({suffix}) sf={SF} captured {time.strftime('%F %T')}\n")
        fh.write(f"# build+explain wall: {time.time() - t0:.1f}s\n")
        fh.write(txt)
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)
print("DONE", flush=True)
