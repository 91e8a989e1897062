#!/usr/bin/env python
"""Deletion-vector vs copy-on-write point-delete scale probe.

The r7 DV design claims: a point delete costs one detection scan plus
an O(1) sidecar, independent of table size, while CoW rewrites every
byte of every touched directory.  This probe MEASURES that claim the
way DEDUP_SCALE measured the banding claims — same layout, growing
data, both modes, bytes-rewritten and wall time reported.

Layout: `ndirs` snapshot directories of `rows_per_dir` rows each; the
delete hits exactly ONE row in ONE directory (the GDPR point-delete
shape).  CoW must rewrite that whole directory; DV writes a one-row
sidecar.  Read-back correctness is asserted on both paths.

Usage: python scripts/dv_scale_probe.py [out]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbt_lab_spark.plans.snapshots import SnapshotTable  # noqa: E402
from dbt_lab_spark.session import get_spark  # noqa: E402

out = open(sys.argv[1], "w") if len(sys.argv) > 1 else sys.stderr
spark = get_spark(
    app_name="dv-scale-probe",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

NDIRS = 8


def dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def build(root: str, rows_per_dir: int) -> SnapshotTable:
    t = SnapshotTable(root)
    for g in range(NDIRS):
        t.append(
            spark.range(g * rows_per_dir, (g + 1) * rows_per_dir).select(
                F.col("id").alias("k"),
                (F.col("id") * 3).alias("v"),
                F.sha1(F.col("id").cast("string")).alias("pad"),
            )
        )
    return t


print(
    f"{'rows/dir':>10} {'mode':>4} {'wall_s':>8} {'bytes_rewritten':>16} "
    f"{'sidecar_bytes':>14}",
    file=out, flush=True,
)
for rows_per_dir in (10_000, 100_000, 1_000_000):
    target = rows_per_dir * 3 + 17  # one row, mid-table
    for mode in ("cow", "dv"):
        tmp = tempfile.mkdtemp(prefix=f"dvprobe_{mode}_")
        try:
            t = build(os.path.join(tmp, "t"), rows_per_dir)
            before = set(t._log()[-1]["files"])
            t0 = time.perf_counter()
            res = t.delete_where(spark, f"k = {target}", mode=mode)
            wall = time.perf_counter() - t0
            after = t._log()[-1]
            new_data_dirs = [d for d in after["files"] if d not in before]
            rewritten = sum(dir_bytes(d) for d in new_data_dirs)
            sidecar = sum(
                dir_bytes(d)
                for d in (after.get("dvs") or [])
                if os.path.isdir(d)
            )
            assert res["n_deleted"] == 1
            assert (
                t.read(spark).filter(F.col("k") == target).count() == 0
            ), "deleted row still visible"
            print(
                f"{rows_per_dir:>10} {mode:>4} {wall:>8.2f} "
                f"{rewritten:>16,} {sidecar:>14,}",
                file=out, flush=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
print("DONE", file=out, flush=True)
