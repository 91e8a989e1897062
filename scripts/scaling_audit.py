#!/usr/bin/env python
"""Output-cardinality scaling audit: count every declared query's
result rows at two SFs and flag super-linear growth.

A query whose OUTPUT grows faster than its input can be perfectly
correct at the sf0.01 gate and still be impossible at 100 TB — no
partitioning strategy survives a result set that is quadratic in the
corpus.  This audit is what surfaced the two r1 scale bugs:

  - q_fuzzy_pairs: row-level blocked levenshtein pairs — ~|block|^2
    rows (11M at sf0.1); fixed by rolling up to distinct names first.
  - q_simhash_pairs at hamming<=6: the 4-6 hamming band is the
    random-collision tail, 87x growth for 10x data; fixed by the
    WWW'07 hamming<=3 cut (true near-dups, ~linear).

Usage: python scripts/scaling_audit.py [sf_small sf_big [out]]
Flags ratio > 15x with >1000 rows at the larger SF.
"""
import sys

sys.path.insert(0, "/root/repo")

from dbt_lab_spark.session import get_spark

import __spark_entry__ as e

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SF2 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
out = open(sys.argv[3], "w") if len(sys.argv) > 3 else sys.stderr

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
n_flag = 0
for name in sorted(e.queries()):
    q = e.queries()[name]
    try:
        c1, c2 = q(spark, SF1).count(), q(spark, SF2).count()
    except Exception as ex:
        print(f"{name:32s} ERR {type(ex).__name__}: {str(ex)[:120]}", file=out, flush=True)
        continue
    ratio = (c2 / c1) if c1 else (float("inf") if c2 else 1.0)
    flag = ratio > 15 and c2 > 1000
    n_flag += flag
    print(
        f"{name:32s} {c1:>10d} {c2:>10d} {ratio:8.1f}x{' <<< SUPERLINEAR' if flag else ''}",
        file=out,
        flush=True,
    )
print(f"DONE flagged={n_flag}", file=out, flush=True)
sys.exit(1 if n_flag else 0)
