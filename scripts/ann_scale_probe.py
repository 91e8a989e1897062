#!/usr/bin/env python
"""Snapshot-ANN scale probe (r8): measure what the snapshot-maintained
IVF index actually buys at a corpus size where scan cost dominates —
the evidence counterpart of DV_SCALE_r7 (measure, don't argue).

Corpus: N deterministic 64-dim vectors (no RNG), committed in TWO
installments (commit + append — the incremental-maintenance path),
C centroids trained with one Lloyd pass, F files per directory.

Measured:
  - index maintenance overhead: clustered write vs plain write of the
    same batches (the one range shuffle + manifest pass);
  - knn(q, k, nprobe) wall time through the PROBE-PRUNED snapshot read
    vs the same audited ivf_knn over the full corpus (identical
    results asserted);
  - files kept / files total for the probe.

Usage: python scripts/ann_scale_probe.py [N] [out]
"""
from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbt_lab_spark.llm.similarity import ivf_centroids, ivf_knn  # noqa: E402
from dbt_lab_spark.plans.snapshots import SnapshotTable  # noqa: E402
from dbt_lab_spark.session import get_spark  # noqa: E402

DIM = 64
C = 64       # inverted lists
NPROBE = 4
FILES = 32   # files per snapshot directory


def vecs(spark, lo: int, hi: int):
    emb = F.array(
        *[
            ((F.col("id") * 31 + j * 17 + (F.col("id") % (j + 3)) * 7) % 211
             - 105).cast("double") / 105.0
            for j in range(DIM)
        ]
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ANN_SCALE_r8.txt"
    spark = get_spark(app_name="ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    lines: list[str] = []

    def log(s: str) -> None:
        print(s)
        lines.append(s)

    corpus = vecs(spark, 10, 10 + n)
    t0 = time.time()
    cents = ivf_centroids(corpus, num_centroids=C, iters=1, dim=DIM)
    t_train = time.time() - t0
    log(f"corpus {n} x dim{DIM}; {C} centroids trained (1 Lloyd pass) "
        f"in {t_train:.1f}s")

    half = 10 + n // 2
    root = tempfile.mkdtemp(prefix="ann_probe_")
    root_plain = tempfile.mkdtemp(prefix="ann_plain_")
    try:
        t0 = time.time()
        t = SnapshotTable(
            root, ann_col="embedding", ann_lists=C, ann_files=FILES,
            ann_centroids=cents,
        )
        t.commit(vecs(spark, 10, half))
        t.append(vecs(spark, half, 10 + n))
        t_indexed = time.time() - t0
        t0 = time.time()
        p = SnapshotTable(root_plain)
        p.commit(vecs(spark, 10, half).repartition(FILES))
        p.append(vecs(spark, half, 10 + n).repartition(FILES))
        t_plain = time.time() - t0
        log(
            f"indexed write (cluster-order + manifest): {t_indexed:.1f}s vs "
            f"plain write {t_plain:.1f}s -> maintenance overhead "
            f"{t_indexed / t_plain:.2f}x"
        )

        queries = vecs(spark, 0, 5).withColumnRenamed("vec_id", "query_id")
        kept, total = t.ann_pruned_file_count(queries, nprobe=NPROBE)
        log(f"probe (5-query union) nprobe={NPROBE}/{C}: reads "
            f"{kept}/{total} files ({kept / total:.1%})")
        one = vecs(spark, 0, 1).withColumnRenamed("vec_id", "query_id")
        k1, t1 = t.ann_pruned_file_count(one, nprobe=NPROBE)
        log(f"probe (single query) nprobe={NPROBE}/{C}: reads "
            f"{k1}/{t1} files ({k1 / t1:.1%}) — the point-lookup shape")

        t0 = time.time()
        got = sorted(map(tuple, t.knn(spark, queries, k=10, nprobe=NPROBE).collect()))
        t_pruned = time.time() - t0
        t0 = time.time()
        ref = sorted(
            map(
                tuple,
                ivf_knn(
                    t.read(spark), queries, cents, k=10, nprobe=NPROBE,
                    scorer="jvm",
                ).collect(),
            )
        )
        t_full = time.time() - t0
        same = got == ref
        log(
            f"knn top-10 x 5 queries: probe-pruned {t_pruned:.1f}s vs "
            f"full-corpus ivf_knn {t_full:.1f}s ({t_full / t_pruned:.2f}x); "
            f"results identical={same}"
        )
        if not same:
            sys.exit(1)

        # retrain cost + drift metric (VERDICT r8 #4): append a
        # second-mode batch the quantizer never saw, read the
        # staleness signal off the manifests (no rescan), then price
        # compact(retrain_ann=True) — one training pass + one range
        # shuffle of the table — and verify knn equals a fresh
        # full-corpus ivf_knn under the new centroids.
        drift_emb = F.array(
            *[
                (F.lit(1.0) if j < 2
                 else ((F.col("id") * 13 + j) % 7).cast("double") * 50.0)
                for j in range(DIM)
            ]
        )
        drifted = spark.range(10 + n, 10 + n + n // 4).select(
            F.col("id").alias("vec_id"), drift_emb.alias("embedding")
        )
        t.append(drifted)
        stale = t.ann_staleness()
        log(
            f"drift metric after off-distribution append (n/4 rows): "
            f"base_mean_sim={stale['base_mean_sim']:.4f} "
            f"latest={stale['latest_mean_sim']:.4f} "
            f"staleness={stale['staleness']:.4f} (manifest-only, no rescan)"
        )
        t0 = time.time()
        t.compact(spark, retrain_ann=True, n_files=FILES)
        t_retrain = time.time() - t0
        post = t.ann_staleness()
        new_cents = t._log()[-1]["ann"]["centroids"]
        t0 = time.time()
        got2 = sorted(
            map(tuple, t.knn(spark, queries, k=10, nprobe=NPROBE).collect())
        )
        t_knn2 = time.time() - t0
        ref2 = sorted(
            map(
                tuple,
                ivf_knn(
                    t.read(spark), queries, new_cents, k=10, nprobe=NPROBE,
                    scorer="jvm",
                ).collect(),
            )
        )
        k2, t2 = t.ann_pruned_file_count(one, nprobe=NPROBE)
        log(
            f"retrain (compact(retrain_ann=True), {n + n // 4} rows): "
            f"{t_retrain:.1f}s = {t_retrain / t_indexed:.2f}x the initial "
            f"indexed write; post-retrain staleness={post['staleness']:.4f}; "
            f"knn {t_knn2:.1f}s, pruning {k2}/{t2} files; results == fresh "
            f"full-corpus ivf_knn under the new centroids: {got2 == ref2}"
        )
        if got2 != ref2:
            sys.exit(1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root_plain, ignore_errors=True)

    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# written to {out_path}")


if __name__ == "__main__":
    main()
