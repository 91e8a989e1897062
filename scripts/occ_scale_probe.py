#!/usr/bin/env python
"""OCC commit-protocol scale probe (r8): measure what the
optimistic-concurrency snapshot log costs and guarantees under real
contention — the evidence counterpart of DV_SCALE_r7 (measure, don't
argue).

Three experiments on one local[*] session:

1. THROUGHPUT/SAFETY: W writer threads x K appends each (every writer
   its own SnapshotTable handle, process-equivalent), all racing on one
   table.  Report wall time, commits/sec, and verify ZERO lost commits
   (final row count == sum of batches, version chain gapless).
2. CONTENTION TAX: the same W x K serialized (one writer at a time) —
   the delta against (1) is what conflict-rebasing costs.
3. CONFLICT SEMANTICS: a merge racing W appends — count loud aborts
   (ConcurrentWriteError) vs successes across R rounds; a merge must
   either abort or land on the head it read, never drop an append.

Usage: python scripts/occ_scale_probe.py [out]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbt_lab_spark.plans.snapshots import (  # noqa: E402
    ConcurrentWriteError,
    SnapshotTable,
)
from dbt_lab_spark.session import get_spark  # noqa: E402

W = 8        # concurrent writers
K = 4        # appends per writer
ROWS = 5000  # rows per batch


def batch(spark, writer: int, i: int):
    lo = (writer * K + i) * ROWS
    return spark.range(lo, lo + ROWS).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def run_writers(spark, root: str, concurrent: bool) -> float:
    def work(w: int) -> None:
        t = SnapshotTable(root)
        for i in range(K):
            t.append(batch(spark, w, i))

    t0 = time.time()
    if concurrent:
        with ThreadPoolExecutor(max_workers=W) as ex:
            list(ex.map(work, range(W)))
    else:
        for w in range(W):
            work(w)
    return time.time() - t0


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "OCC_SCALE_r8.txt"
    spark = get_spark(app_name="occ-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    lines: list[str] = []

    def log(s: str) -> None:
        print(s)
        lines.append(s)

    n_commits = W * K
    n_rows = n_commits * ROWS

    # 1. concurrent safety + throughput
    root_c = tempfile.mkdtemp(prefix="occ_conc_")
    try:
        wall_c = run_writers(spark, root_c, concurrent=True)
        t = SnapshotTable(root_c)
        versions = t.versions()
        count = t.read(spark).count()
        ok = versions == list(range(n_commits)) and count == n_rows
        log(
            f"concurrent: {W} writers x {K} appends = {n_commits} commits "
            f"in {wall_c:.1f}s ({n_commits / wall_c:.2f} commits/s); "
            f"rows {count}/{n_rows}, versions gapless={versions == list(range(n_commits))} "
            f"-> {'ZERO LOST COMMITS' if ok else 'LOST COMMITS (BUG)'}"
        )
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(root_c, ignore_errors=True)

    # 2. serialized baseline (contention tax)
    root_s = tempfile.mkdtemp(prefix="occ_ser_")
    try:
        wall_s = run_writers(spark, root_s, concurrent=False)
        log(
            f"serialized: same {n_commits} commits in {wall_s:.1f}s "
            f"({n_commits / wall_s:.2f} commits/s); concurrent/serialized "
            f"wall = {wall_c / wall_s:.2f}x (conflict-rebase tax + "
            "thread-level job parallelism)"
        )
    finally:
        shutil.rmtree(root_s, ignore_errors=True)

    # 3. merge racing appends: loud abort or correct land, never a lost append
    root_m = tempfile.mkdtemp(prefix="occ_merge_")
    try:
        t = SnapshotTable(root_m)
        t.commit(batch(spark, 0, 0))
        aborts = lands = 0
        R = 4
        for r in range(R):
            src = spark.createDataFrame([(r, -1)], "k long, v long")

            def appender(i: int) -> None:
                SnapshotTable(root_m).append(batch(spark, 1 + r, i % K))

            def merger(_: int):
                try:
                    return SnapshotTable(root_m).merge(spark, src, on=["k"])
                except ConcurrentWriteError:
                    return None

            with ThreadPoolExecutor(max_workers=3) as ex:
                fa = ex.submit(appender, r)
                fm = ex.submit(merger, r)
                fa.result()
                res = fm.result()
            if res is None:
                aborts += 1
            else:
                lands += 1
        t = SnapshotTable(root_m)
        # every append must be present regardless of merge outcome
        expected_appends = R
        n_versions = len(t.versions())
        log(
            f"merge-vs-append races over {R} rounds: {lands} merges landed, "
            f"{aborts} aborted LOUDLY (ConcurrentWriteError); "
            f"{n_versions} versions committed "
            f"(1 base + {expected_appends} appends + {lands} merges = "
            f"{1 + expected_appends + lands}, match="
            f"{n_versions == 1 + expected_appends + lands}); no append lost"
        )
        if n_versions != 1 + expected_appends + lands:
            sys.exit(1)
    finally:
        shutil.rmtree(root_m, ignore_errors=True)

    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# written to {out_path}")


if __name__ == "__main__":
    main()
