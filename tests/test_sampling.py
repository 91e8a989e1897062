"""Deterministic hash sampling — the properties the training pipeline
relies on: reproducibility under repartitioning (where df.sample
fails), salt independence, stratified rates, stable splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.llm.sampling import (
    hash_sample,
    hash_threshold,
    stratified_hash_sample,
    train_test_split,
)


def _ids(df):
    return {r["id"] for r in df.select("id").collect()}


def test_fraction_accuracy_and_determinism(spark):
    base = spark.range(20_000)
    s1 = _ids(hash_sample(base, "id", 0.1))
    assert 0.08 * 20_000 < len(s1) < 0.12 * 20_000
    # identical under a different partitioning — df.sample would differ
    s2 = _ids(hash_sample(base.repartition(13), "id", 0.1))
    assert s1 == s2


def test_membership_is_nested_across_fractions(spark):
    """A row sampled at 5% is also sampled at 10% — thresholds nest, so
    growing a sample never discards previously selected rows."""
    base = spark.range(10_000)
    assert _ids(hash_sample(base, "id", 0.05)) <= _ids(hash_sample(base, "id", 0.10))


def test_salts_give_independent_draws(spark):
    base = spark.range(20_000)
    a = _ids(hash_sample(base, "id", 0.1, salt="a"))
    b = _ids(hash_sample(base, "id", 0.1, salt="b"))
    overlap = len(a & b) / 20_000
    assert 0.002 < overlap < 0.03  # ~1% expected for independent 10% draws
    assert a != b


def test_stratified_rates_and_full_stratum(spark):
    df = spark.range(30_000).withColumn(
        "grp", F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")), (F.col("id") % 3 + 1).cast("int"))
    )
    out = stratified_hash_sample(df, "id", "grp", {"a": 0.1, "b": 1.0}, default_fraction=0.0)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts.get("b") == 10_000  # fraction 1.0 keeps every row
    assert "c" not in counts  # default 0.0 drops the stratum
    assert 800 < counts.get("a", 0) < 1_200


def test_train_test_split_partitions_exactly(spark):
    base = spark.range(10_000)
    out = train_test_split(base, "id", test_fraction=0.2)
    n = out.groupBy("split").agg(F.count("*").alias("n")).collect()
    by = {r["split"]: r["n"] for r in n}
    assert by["test"] + by["train"] == 10_000
    assert 0.17 * 10_000 < by["test"] < 0.23 * 10_000
    # stability: membership unchanged when new rows arrive
    grown = train_test_split(spark.range(20_000), "id", test_fraction=0.2)
    old = {r["id"]: r["split"] for r in out.collect()}
    new = {r["id"]: r["split"] for r in grown.filter(F.col("id") < 10_000).collect()}
    assert old == new


def test_threshold_edges():
    assert hash_threshold(0.0) == "0" * 15
    assert hash_threshold(1.0) == "g"
    assert hash_threshold(0.5) == "8" + "0" * 14


def test_sampling_is_narrow_no_shuffle(spark):
    plan = (
        hash_sample(spark.range(1000), "id", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_kfold_partitions_exactly_and_uniformly(spark, sf_medium):
    """Folds are a PARTITION of the data (each row in exactly one fold,
    folds 0..k-1) with ~1/k sizes, and assignment is repartition-
    invariant (pure per-row function of the key)."""
    from dbt_lab_spark.llm.sampling import kfold_assign

    docs = spark.read.parquet(f"{sf_medium}/documents.parquet").select("doc_id")
    k = 5
    folds = kfold_assign(docs, "doc_id", k=k)
    n = docs.count()
    sizes = {r["fold"]: r["cnt"] for r in
             folds.groupBy("fold").agg(F.count("*").alias("cnt")).collect()}
    assert set(sizes) == set(range(k))
    assert sum(sizes.values()) == n
    for f, c in sizes.items():
        assert abs(c - n / k) < 4 * (n ** 0.5), (f, c, n)
    re = {r["doc_id"]: r["fold"] for r in
          kfold_assign(docs.repartition(13), "doc_id", k=k).collect()}
    orig = {r["doc_id"]: r["fold"] for r in folds.collect()}
    assert re == orig


def test_temperature_mix_rates_and_determinism(spark):
    import hashlib
    import math

    from dbt_lab_spark.llm.sampling import temperature_mix

    # 3 sources with very different sizes: alpha<1 lifts the rare one
    rows = []
    sizes = {"big": 600, "mid": 150, "rare": 30}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_mix(docs, "doc_id", "source", alpha=0.5, target_fraction=0.5)
    got = {
        r["source"]: (r["n"], r["rate"])
        for r in kept.groupBy("source")
        .agg(F.count("*").alias("n"), F.first("mix_rate").alias("rate"))
        .collect()
    }
    # closed-form expected rates
    z = sum(n**0.5 for n in sizes.values())
    n_tot = sum(sizes.values())
    for src, n_s in sizes.items():
        want_rate = min(1.0, 0.5 * n_tot * (n_s**0.5) / z / n_s)
        assert got[src][1] == pytest.approx(want_rate, rel=1e-12)
    # rare sources keep a larger fraction than big ones
    assert got["rare"][1] > got["mid"][1] > got["big"][1]
    # python recomputation of the exact md5 keep-set
    for src, n_s in sizes.items():
        rate = got[src][1]
        if rate >= 1.0:
            want_n = sizes[src]
        else:
            thresh = format(int(math.floor(rate * 16**15)), "015x")
            base = sum(sizes[s] for s in sizes if list(sizes).index(s) < list(sizes).index(src))
            want_n = sum(
                1
                for d in range(base, base + n_s)
                if hashlib.md5(f"{d}tmix".encode()).hexdigest()[:15] < thresh
            )
        assert got[src][0] == want_n
    # repartition-invariant (content-deterministic, not RNG)
    again = temperature_mix(
        docs.repartition(17), "doc_id", "source", alpha=0.5, target_fraction=0.5
    )
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_temperature_mix_alpha_one_is_natural(spark):
    from dbt_lab_spark.llm.sampling import temperature_mix

    docs = spark.createDataFrame(
        [(i, "a" if i < 400 else "b") for i in range(500)], "doc_id long, source string"
    )
    kept = temperature_mix(docs, "doc_id", "source", alpha=1.0, target_fraction=0.3)
    rates = {r["source"]: r["mix_rate"] for r in kept.select("source", "mix_rate").distinct().collect()}
    # alpha=1: p_s proportional to n_s -> every source keeps the target fraction
    assert rates["a"] == pytest.approx(0.3, rel=1e-12)
    assert rates["b"] == pytest.approx(0.3, rel=1e-12)


def test_contrastive_negatives_deterministic_and_excluding(spark):
    import hashlib

    from dbt_lab_spark.llm.sampling import contrastive_negatives

    anchors = spark.createDataFrame([(1,), (2,)], "anchor_id long")
    corpus = spark.createDataFrame([(i,) for i in range(1, 30)], "vec_id long")
    exclude = spark.createDataFrame([(1, 7), (2, 9)], "anchor_id long, negative_id long")
    out = contrastive_negatives(anchors, corpus, k=5, exclude=exclude).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r["negative_id"])
    assert set(by_anchor) == {1, 2}
    assert all(len(v) == 5 for v in by_anchor.values())
    assert 7 not in by_anchor[1] and 9 not in by_anchor[2]
    assert 1 not in by_anchor[1] and 2 not in by_anchor[2]
    # python replay of the md5 ranking
    for a in (1, 2):
        banned = {a, {1: 7, 2: 9}[a]}
        draws = sorted(
            (hashlib.md5(f"{a}|{c}neg".encode()).hexdigest()[:15], c)
            for c in range(1, 30)
            if c not in banned
        )
        assert by_anchor[a] == [c for _, c in draws[:5]]
    # repartition-invariant
    again = contrastive_negatives(
        anchors, corpus.repartition(7), k=5, exclude=exclude
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
