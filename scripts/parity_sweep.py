#!/usr/bin/env python
"""Full oracle-parity sweep: run EVERY oracle-backed query in
`__spark_entry__.queries()` at a given SF dir and hash-compare against
its DuckDB oracle — the driver-gate mimic (tests/oracle.py) applied at
scale factors the gate itself doesn't cover.

Why this exists: the driver's correctness gate runs at sf0.01 only.
sf0.001 exercises tiny-table edges (empty groups, short docs, windows
larger than the data); sf0.1 exercises threshold-sensitive oracles
(percentile cuts, similarity thresholds) at 10x the gate's data.  Run
both before calling a round done:

    python scripts/parity_sweep.py /root/testdata/sf0.001 /tmp/p0001.txt
    python scripts/parity_sweep.py /root/testdata/sf0.1   /tmp/p01.txt

Last full result (r1): 116/116 OK at sf0.001, sf0.01, and sf0.1.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

import __spark_entry__ as e
from oracle import duckdb_connect, compare  # noqa: E402  (tests/oracle.py)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = open(sys.argv[2], "w") if len(sys.argv) > 2 else sys.stderr

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb_connect(SF)
qs, osql = e.queries(), e.oracle_sql()
n_ok = n_bad = n_err = 0
for name in sorted(qs):
    if name not in osql:
        continue
    t0 = time.time()
    try:
        rep = compare(qs[name](spark, SF), con, osql[name])
        if rep["ok"]:
            n_ok += 1
            print(f"OK   {name} ({time.time() - t0:.1f}s)", file=out, flush=True)
        else:
            n_bad += 1
            print(f"FAIL {name}: {rep}", file=out, flush=True)
    except Exception as ex:  # keep sweeping; report at the end
        n_err += 1
        print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:200]}", file=out, flush=True)
print(f"DONE ok={n_ok} fail={n_bad} err={n_err}", file=out, flush=True)
sys.exit(0 if (n_bad == 0 and n_err == 0) else 1)
