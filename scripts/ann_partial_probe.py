#!/usr/bin/env python
"""Partial-ANN-retrain scale probe (VERDICT r9 #5): price
compact(retrain_ann=True, only_drifted=) against the full retrain on
the same drifted table and verify the cost is O(drifted), not
O(table).

Setup: BASE_DIRS directories of in-distribution vectors + DRIFT_DIRS
directories of a second directional mode (the ann_scale_probe drift
construction), dims=DIM.  The table is built once and copied, so full
and partial retrain see byte-identical inputs.

Measured:
  * wall time: full retrain (rewrites every dir) vs partial (rewrites
    only the drifted dirs) — expect partial/full ~ drifted fraction
  * bytes rewritten by each
  * correctness: post-partial knn with nprobe=C == brute force over
    the whole corpus (the exactness invariant of per-generation
    codebooks), and carried dirs are the SAME paths

Usage: python scripts/ann_partial_probe.py [out.txt]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbt_lab_spark.llm.similarity import brute_force_knn  # noqa: E402
from dbt_lab_spark.plans.snapshots import SnapshotTable  # noqa: E402
from dbt_lab_spark.session import get_spark  # noqa: E402

BASE_DIRS = 8
DRIFT_DIRS = 2
ROWS_PER_DIR = 20_000
DIM = 64
C = 16
FILES = 4


def base_vecs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") % (j + 2)).cast("double") + 1.0)
                for j in range(DIM)
            ]
        ).alias("embedding"),
    )


def drift_vecs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.lit(1.0)
                if j < 2
                else ((F.col("id") * 13 + j) % 7).cast("double") * 50.0
                for j in range(DIM)
            ]
        ).alias("embedding"),
    )


def table_bytes(t: SnapshotTable, dirs) -> int:
    return sum(
        os.path.getsize(p) for d in dirs for p in t._data_files(d)
    )


def main(out_path: str) -> None:
    lines: list[str] = []

    def log(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    spark = get_spark(app_name="ann-partial-probe")
    base = tempfile.mkdtemp(prefix="ann_partial_")
    root_full = os.path.join(base, "full")
    t = SnapshotTable(root_full, ann_col="embedding", ann_lists=C, ann_files=FILES)
    n = 0
    for _ in range(BASE_DIRS):
        t.append(base_vecs(spark, n, n + ROWS_PER_DIR))
        n += ROWS_PER_DIR
    for _ in range(DRIFT_DIRS):
        t.append(drift_vecs(spark, n, n + ROWS_PER_DIR))
        n += ROWS_PER_DIR
    head = t._log()[-1]
    stale = t.ann_staleness()
    log(
        f"setup: {BASE_DIRS} base + {DRIFT_DIRS} drifted dirs x "
        f"{ROWS_PER_DIR} rows, dim={DIM}, C={C}; "
        f"staleness={stale['staleness']:.4f}"
    )
    dir_stale = t.ann_dir_staleness()
    drifted = [d for d in head["files"] if dir_stale[d] > 0.05]
    log(
        f"per-dir staleness: drifted={len(drifted)}/{len(head['files'])} "
        f"(threshold 0.05) — matches construction: "
        f"{len(drifted) == DRIFT_DIRS}"
    )

    # copy for the partial variant BEFORE either retrain
    root_part = os.path.join(base, "partial")
    shutil.copytree(root_full, root_part)
    tp = SnapshotTable(root_part, ann_col="embedding", ann_lists=C, ann_files=FILES)

    all_bytes = table_bytes(t, head["files"])
    drift_bytes = table_bytes(t, drifted)

    t0 = time.time()
    t.compact(spark, retrain_ann=True, n_files=FILES)
    t_full = time.time() - t0

    t0 = time.time()
    v = tp.compact(spark, retrain_ann=True, only_drifted=0.05, n_files=FILES)
    t_part = time.time() - t0
    assert v is not None

    hp = tp._log()[-1]
    carried = [d for d in head["files"] if d not in drifted]
    log(
        f"full retrain: {t_full:.1f}s rewrote {all_bytes/1e6:.1f} MB "
        f"({len(head['files'])} dirs)"
    )
    log(
        f"partial retrain: {t_part:.1f}s rewrote {drift_bytes/1e6:.1f} MB "
        f"({len(drifted)} dirs); wall ratio {t_part/t_full:.2f}x, "
        f"data ratio {drift_bytes/all_bytes:.2f}x"
    )
    log(
        f"carried by reference: {all(d in hp['files'] for d in carried)}; "
        f"generations={len(tp._ann_gen_map(hp))}"
    )

    # exactness invariant on a sample: nprobe=C knn == brute force
    qs = (
        base_vecs(spark, 3, 6)
        .union(drift_vecs(spark, BASE_DIRS * ROWS_PER_DIR + 5,
                          BASE_DIRS * ROWS_PER_DIR + 8))
        .withColumnRenamed("vec_id", "query_id")
    )
    corpus = base_vecs(spark, 0, BASE_DIRS * ROWS_PER_DIR).union(
        drift_vecs(
            spark, BASE_DIRS * ROWS_PER_DIR,
            (BASE_DIRS + DRIFT_DIRS) * ROWS_PER_DIR,
        )
    )
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in tp.knn(spark, qs, k=10, nprobe=C).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in brute_force_knn(
            corpus, qs, k=10, vec_col="embedding", id_col="vec_id"
        ).collect()
    )
    log(f"post-partial knn(nprobe=C) == brute force: {got == want}")
    assert got == want

    # pruned point query still prunes on the mixed-generation table
    q1 = base_vecs(spark, 3, 4).withColumnRenamed("vec_id", "query_id")
    kept, total = tp.ann_pruned_file_count(q1, nprobe=2)
    log(f"mixed-gen point-query file pruning: {kept}/{total} files read")

    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    log(f"wrote {out_path}")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ANN_SCALE_r10.txt")
