#!/usr/bin/env python
"""Multi-PROCESS OCC probe (VERDICT r9 #6): the thread-level racing-
writer matrix (occ_scale_probe.py, test_wave37/39) shares one JVM and
one Python process — this probe runs N SEPARATE Python processes, the
deployment story the CommitProtocol seam exists for (independent Spark
drivers committing to one table over a shared filesystem).

Three experiments:

1. PROTOCOL RACE (no Spark): W worker processes x K metadata-only
   commits each through SnapshotTable._append_log + LocalCommitProtocol
   hard links, every worker rebasing on ConcurrentWriteError.  Verify:
   version chain gapless, every worker's every commit present EXACTLY
   once, zero lost commits.  High-volume cross-process contention on
   the put_if_absent primitive itself.

2. FULL STACK (own Spark session per process): W processes each start
   their own local[2] SparkSession and run K real appends.  Verify:
   final row count == sum of all batches, chain gapless.  This is N
   independent drivers racing one table.

3. VACUUM-LOCK LIVENESS: one process vacuums with an artificially slow
   sweep (longer than VACUUM_LOCK_STALE_S would tolerate without the
   r10 heartbeat) while W processes commit — every commit must WAIT
   and land (no StaleCommitMarkerError on a live lock, no lost
   commits).  Pins the ADVICE-r9 heartbeat fix cross-process.

Usage: python scripts/occ_scale_mp.py [out.txt]
Internal worker modes: --proto-worker / --spark-worker / --vacuum-worker
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

PROTO_W, PROTO_K = 8, 25
SPARK_W, SPARK_K, ROWS = 4, 3, 2000
VAC_W, VAC_K = 4, 2


def _proto_worker(root: str, w: int, k: int) -> None:
    from dbt_lab_spark.plans.snapshots import (
        ConcurrentWriteError,
        SnapshotTable,
    )

    t = SnapshotTable(root)
    for i in range(k):
        for _ in range(500):  # rebase loop, far above APPEND_RETRIES
            head = t._head_state()
            files = list(head[0]["files"]) if head else []
            rec = {
                "operation": f"probe_w{w}_i{i}",
                "files": files,
            }
            try:
                t._append_log(
                    rec,
                    expected_parent=head[0]["version"] if head else -1,
                )
                break
            except ConcurrentWriteError:
                continue
        else:
            sys.exit(11)  # starved: should not happen


def _spark_worker(root: str, w: int, k: int) -> None:
    from pyspark.sql import functions as F

    from dbt_lab_spark.plans.snapshots import SnapshotTable
    from dbt_lab_spark.session import get_spark

    spark = get_spark(
        app_name=f"occ-mp-{w}", master="local[2]", shuffle_partitions=2
    )
    t = SnapshotTable(root)
    for i in range(k):
        lo = (w * k + i) * ROWS
        t.append(
            spark.range(lo, lo + ROWS).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            )
        )
    spark.stop()


def _vacuum_worker(root: str) -> None:
    """Vacuum whose sweep is artificially slowed past the stale
    threshold — only the heartbeat keeps waiting committers from
    declaring the lock dead."""
    import shutil as _shutil

    from dbt_lab_spark.plans import snapshots as S

    t = S.SnapshotTable(root)
    t.VACUUM_LOCK_STALE_S = 2.0  # aggressive: sweep must outlive this
    orig_rmtree = _shutil.rmtree

    def slow_rmtree(p, **kw):
        time.sleep(1.5)
        return orig_rmtree(p, **kw)

    _shutil.rmtree = slow_rmtree
    try:
        t.vacuum(keep_last=1, grace_s=0.0)
    finally:
        _shutil.rmtree = orig_rmtree


def _vacuum_commit_worker(root: str, w: int, k: int) -> None:
    from dbt_lab_spark.plans.snapshots import (
        ConcurrentWriteError,
        SnapshotTable,
    )

    t = SnapshotTable(root)
    t.VACUUM_LOCK_STALE_S = 2.0  # same aggressive threshold as vacuum
    for i in range(k):
        for _ in range(500):
            head = t._head_state()
            rec = {
                "operation": f"vprobe_w{w}_i{i}",
                "files": list(head[0]["files"]) if head else [],
            }
            try:
                t._append_log(
                    rec,
                    expected_parent=head[0]["version"] if head else -1,
                )
                break
            except ConcurrentWriteError:
                continue
        else:
            sys.exit(11)


def _spawn(mode: str, root: str, w: int, k: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), mode, root, str(w), str(k)],
        cwd="/root/repo",
    )


def main(out_path: str) -> None:
    from pyspark.sql import functions as F

    from dbt_lab_spark.plans.snapshots import SnapshotTable
    from dbt_lab_spark.session import get_spark

    lines: list[str] = []

    def log(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    base = tempfile.mkdtemp(prefix="occ_mp_")

    # -- 1: protocol race --------------------------------------------------
    root1 = os.path.join(base, "proto")
    t0 = time.time()
    procs = [_spawn("--proto-worker", root1, w, PROTO_K) for w in range(PROTO_W)]
    rcs = [p.wait() for p in procs]
    dt = time.time() - t0
    t = SnapshotTable(root1)
    vs = t.versions()
    ops = [t._read_seg(v)["op"] for v in vs]
    expected = {f"probe_w{w}_i{i}" for w in range(PROTO_W) for i in range(PROTO_K)}
    gapless = vs == list(range(len(vs)))
    log(
        f"proto-race: W={PROTO_W} procs x K={PROTO_K} commits "
        f"rcs={rcs} wall={dt:.1f}s rate={len(expected)/dt:.1f}/s"
    )
    log(
        f"proto-race: versions={len(vs)} gapless={gapless} "
        f"all_present_exactly_once="
        f"{sorted(ops) == sorted(expected) and len(set(ops)) == len(ops)}"
    )
    assert all(rc == 0 for rc in rcs) and gapless
    assert sorted(ops) == sorted(expected)

    # -- 2: full stack -----------------------------------------------------
    root2 = os.path.join(base, "sparkful")
    t0 = time.time()
    procs = [_spawn("--spark-worker", root2, w, SPARK_K) for w in range(SPARK_W)]
    rcs = [p.wait() for p in procs]
    dt = time.time() - t0
    spark = get_spark(app_name="occ-mp-verify", shuffle_partitions=4)
    t = SnapshotTable(root2)
    n = t.read(spark).count()
    want = SPARK_W * SPARK_K * ROWS
    vs = t.versions()
    gapless = vs == list(range(len(vs)))
    log(
        f"full-stack: W={SPARK_W} Spark procs x K={SPARK_K} appends "
        f"rcs={rcs} wall={dt:.1f}s"
    )
    log(
        f"full-stack: rows={n}/{want} versions={len(vs)} gapless={gapless} "
        f"distinct_keys={t.read(spark).select('k').distinct().count()}"
    )
    assert all(rc == 0 for rc in rcs) and n == want and gapless

    # -- 3: vacuum-lock liveness across processes --------------------------
    root3 = os.path.join(base, "vac")
    t3 = SnapshotTable(root3)
    # history to reclaim: several superseded full commits
    for g in range(4):
        t3.commit(
            spark.range(g * 100, (g + 1) * 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
    t0 = time.time()
    vac = _spawn("--vacuum-worker", root3, 0, 0)
    time.sleep(0.3)  # let the vacuum take the lock first
    procs = [
        _spawn("--vacuum-commit-worker", root3, w, VAC_K) for w in range(VAC_W)
    ]
    rcs = [p.wait() for p in procs] + [vac.wait()]
    dt = time.time() - t0
    t3 = SnapshotTable(root3)
    vs = t3.versions()
    ops = {t3._read_seg(v)["op"] for v in vs}
    want_ops = {f"vprobe_w{w}_i{i}" for w in range(VAC_W) for i in range(VAC_K)}
    log(
        f"vacuum-liveness: slow vacuum (stale_s=2.0, sweep>2s) + "
        f"W={VAC_W} procs x K={VAC_K} commits rcs={rcs} wall={dt:.1f}s"
    )
    log(
        f"vacuum-liveness: committed={len(want_ops & ops)}/{len(want_ops)} "
        f"gapless={vs == list(range(vs[0], vs[0] + len(vs)))}"
    )
    assert all(rc == 0 for rc in rcs)
    assert want_ops <= ops
    spark.stop()

    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    log(f"wrote {out_path}")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1].startswith("--") and sys.argv[1] != "--out":
        mode, root, w, k = (
            sys.argv[1],
            sys.argv[2],
            int(sys.argv[3]),
            int(sys.argv[4]),
        )
        if mode == "--proto-worker":
            _proto_worker(root, w, k)
        elif mode == "--spark-worker":
            _spark_worker(root, w, k)
        elif mode == "--vacuum-worker":
            _vacuum_worker(root)
        elif mode == "--vacuum-commit-worker":
            _vacuum_commit_worker(root, w, k)
        else:
            sys.exit(f"unknown mode {mode}")
        sys.exit(0)
    main(sys.argv[1] if len(sys.argv) > 1 else "OCC_SCALE_r10.txt")
