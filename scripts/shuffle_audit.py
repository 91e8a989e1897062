#!/usr/bin/env python
"""Shuffle-volume audit: for every bench query, materialize the result
(noop sink) and report input bytes read vs shuffle bytes written, from
the Spark UI REST API (/api/v1/applications/<id>/stages).

Why: at 100 TB the dominant cost of most queries is the shuffle, not
the scan.  A query that shuffles a large multiple of what it reads has
a missing partial aggregate, a missed broadcast, or an exploded
intermediate — invisible at the correctness gate, fatal at scale.
shuffle_ratio = shuffle_write / input_read; rows is the result size.

Usage: python scripts/shuffle_audit.py [sf_dir [out]]
"""
import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

from dbt_lab_spark.session import get_spark

import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = open(sys.argv[2], "w") if len(sys.argv) > 2 else sys.stderr

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId


def stages():
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        return {
            s["stageId"]: (
                s["inputBytes"],
                s["inputRecords"],
                s["shuffleWriteBytes"],
                s["shuffleWriteRecords"],
            )
            for s in json.load(r)
        }


from bench import BENCH_NAMES  # noqa: E402
from dbt_lab_spark.workload import all_queries  # noqa: E402

builders = {q.name: q.build for q in all_queries()}
seen = set(stages())
print(
    f"{'query':28s} {'in_mb':>7s} {'in_rec':>9s} {'shuf_mb':>8s} {'shuf_rec':>9s} {'rec_ratio':>9s}",
    file=out,
    flush=True,
)
for name in BENCH_NAMES:
    df = builders[name](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    cur = stages()
    new = [v for k, v in cur.items() if k not in seen]
    seen = set(cur)
    inb = sum(v[0] for v in new) / 1e6
    inr = sum(v[1] for v in new)
    shb = sum(v[2] for v in new) / 1e6
    shr = sum(v[3] for v in new)
    # shuffle records vs rows scanned: ~0 on aggregates with partial
    # aggregation; ~1 is inherent for row-preserving shuffles (windows,
    # sorts, shuffle joins); >1 means an exploded intermediate crosses
    # the wire (candidate-pair or shingle blow-up escaping map-side).
    ratio = shr / inr if inr else 0.0
    print(
        f"{name:28s} {inb:7.1f} {inr:9d} {shb:8.1f} {shr:9d} {ratio:9.2f}",
        file=out,
        flush=True,
    )
print("DONE", file=out, flush=True)
