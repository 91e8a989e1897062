#!/usr/bin/env python
"""Dedup one-decade-up scale probe (VERDICT r1 item 6).

Synthesizes an ~sf1-equivalent documents corpus (10x sf0.1 = 50k docs,
same text distribution, planted near-dup chains + a boilerplate hot
bucket), then measures the minhash-LSH dedup path and connected
components at sf0.1 and sf1:

  - q_minhash_pairs-equivalent (minhash_dedup_pairs) WITH and WITHOUT
    the hot-bucket cap -> wall time, pair count, max bucket size;
  - connected_components on the emitted pairs -> wall time, rounds
    implied by the pointer-jumping policy, component count.

Writes a human-readable report to the file given as argv[1] (default
stderr); the corpus goes under /tmp/dedup_probe_sf1 (regenerated only
when missing).  Results are summarized in SCALING.md.

Usage: python scripts/dedup_scale_probe.py /tmp/dedup_probe.txt
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.llm.dedup import connected_components, minhash_dedup_pairs

OUT = open(sys.argv[1], "w") if len(sys.argv) > 1 else sys.stderr
SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/dedup_probe_sf1"
REPLICAS = 10


def log(msg: str) -> None:
    print(msg, file=OUT, flush=True)


def build_sf1(spark: SparkSession) -> None:
    """10 replicas of the sf0.1 corpus with distinct doc_ids.  Replica 0
    keeps original text; replicas 1-2 append a replica tag (=> planted
    near-dup chains of length 3 across replicas); replicas 3+ get the
    tag PREPENDED with the replica number salted into every shingle
    window start (distinct text families).  2% of docs in every replica
    share one identical boilerplate string (the hot-bucket stressor)."""
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n = docs.count()
    parts = []
    for r in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n))
        if r == 0:
            pass
        elif r <= 2:
            d = d.withColumn("text", F.concat(F.col("text"), F.lit(f" replica{r}")))
        else:
            d = d.withColumn(
                "text", F.concat(F.lit(f"replica {r} corpus variant: "), F.col("text"))
            )
        d = d.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 50 == 0,
                F.lit("standard legal boilerplate header applies to this document "
                      "all rights reserved terms and conditions may change"),
            ).otherwise(F.col("text")),
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF1_DIR}/documents.parquet")


def probe(spark: SparkSession, label: str, path: str, cap: int | None) -> dict:
    docs = spark.read.parquet(path).select("doc_id", "text")
    t0 = time.time()
    # same parameters as the q_minhash_pairs workload entry
    from dbt_lab_spark.llm import dedup as D

    sigs = D.minhash_signatures(docs)
    cand = D.minhash_lsh_candidates(sigs, num_bands=16, rows_per_band=4,
                                    max_bucket_size=cap)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b"))
    pairs = (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda v: v)) / F.lit(64.0),
        )
        .filter(F.col("est_jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    pairs = pairs.localCheckpoint(eager=True)  # materialize: time the dedup path alone
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    t0 = time.time()
    comps = connected_components(pairs)
    n_nodes = comps.count()
    n_comps = comps.select("component").distinct().count()
    t_cc = time.time() - t0

    # bucket-size distribution (diagnostic for the straggler story)
    sizes = (
        D.minhash_signatures(docs)
        .select(
            F.posexplode(
                F.array(*[
                    F.xxhash64(*[F.col("signature")[bnd * 4 + r] for r in range(4)], F.lit(bnd))
                    for bnd in range(16)
                ])
            ).alias("band", "bucket")
        )
        .groupBy("band", "bucket").count()
        .agg(F.max("count").alias("mx"), F.expr("percentile(count, 0.999)").alias("p999"))
        .collect()[0]
    )
    rep = dict(label=label, cap=cap, pairs=n_pairs, t_pairs=round(t_pairs, 2),
               nodes=n_nodes, comps=n_comps, t_cc=round(t_cc, 2),
               max_bucket=sizes["mx"], p999_bucket=float(sizes["p999"]))
    log(f"{label:24s} cap={str(cap):6s} pairs={n_pairs:>9} t_pairs={t_pairs:7.2f}s "
        f"cc_nodes={n_nodes:>8} comps={n_comps:>7} t_cc={t_cc:6.2f}s "
        f"max_bucket={sizes['mx']} p999={sizes['p999']:.0f}")
    return rep


def probe_jaccard_skew(spark: SparkSession) -> None:
    """Hot-shingle stressor for exact n-gram jaccard (VERDICT r2 item
    4): a boilerplate-heavy corpus (every 5th doc shares one 12-word
    header => every header shingle sits in ~n/5 docs).  Measures
    candidate-pair volume and wall time capped vs uncapped; the capped
    bound is max_doc_freq^2 pairs per shingle, corpus-independent."""
    from dbt_lab_spark.llm.dedup import ngram_jaccard_all_pairs

    for every in (5, 2):
        docs = (
            spark.read.parquet(f"{SF01}/documents.parquet")
            .select("doc_id", "text")
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % every == 0,
                    F.concat(
                        F.lit("standard legal boilerplate header applies all rights "
                              "reserved terms conditions "),
                        F.col("text"),
                    ),
                ).otherwise(F.col("text")),
            )
        )
        n = docs.count()
        log(f"jaccard skew corpus: {n} docs, {n // every} sharing a 12-word header "
            f"(~{10 * (n // every) ** 2 // 2 / 1e6:.0f}M uncapped index pair-rows)")
        for cap in (None, 100):
            t0 = time.time()
            out = ngram_jaccard_all_pairs(
                docs, shingle_k=3, threshold=0.5, max_doc_freq=cap
            )
            n_pairs = out.count()
            log(f"  ngram_jaccard cap={str(cap):5s} pairs={n_pairs:>7} "
                f"t={time.time() - t0:7.2f}s")
        # PPJoin prefix filtering: structural skew elimination, exact
        from dbt_lab_spark.llm.dedup import ngram_jaccard_ppjoin

        t0 = time.time()
        n_pp = ngram_jaccard_ppjoin(docs, shingle_k=3, threshold=0.5).count()
        log(f"  ngram_jaccard ppjoin    pairs={n_pp:>7} t={time.time() - t0:7.2f}s")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{SF1_DIR}/documents.parquet/_SUCCESS"):
        log("building sf1 corpus (10x sf0.1, planted chains + boilerplate bucket)...")
        build_sf1(spark)
    n1 = spark.read.parquet(f"{SF1_DIR}/documents.parquet").count()
    log(f"sf1 corpus: {n1} docs")

    results = []
    results.append(probe(spark, "sf0.1 uncapped", f"{SF01}/documents.parquet", None))
    results.append(probe(spark, "sf0.1 cap=200", f"{SF01}/documents.parquet", 200))
    results.append(probe(spark, "sf1   uncapped", f"{SF1_DIR}/documents.parquet", None))
    results.append(probe(spark, "sf1   cap=200", f"{SF1_DIR}/documents.parquet", 200))

    r01c, r1c = results[1], results[3]
    r01u, r1u = results[0], results[2]
    log("")
    log(f"growth (capped):   docs x10 -> t_pairs x{r1c['t_pairs'] / max(r01c['t_pairs'], 1e-9):.1f}, "
        f"pairs x{r1c['pairs'] / max(r01c['pairs'], 1):.1f}, t_cc x{r1c['t_cc'] / max(r01c['t_cc'], 1e-9):.1f}")
    log(f"growth (uncapped): docs x10 -> t_pairs x{r1u['t_pairs'] / max(r01u['t_pairs'], 1e-9):.1f}, "
        f"pairs x{r1u['pairs'] / max(r01u['pairs'], 1):.1f}")
    log("")
    probe_jaccard_skew(spark)
    log("DONE")


if __name__ == "__main__":
    main()
