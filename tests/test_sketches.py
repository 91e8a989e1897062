"""Count-min sketch pin tests on planted Zipf-skewed data: the
never-undercount guarantee, the CMS error bound, candidate-superset
for heavy hitters, and exactness of the verified result vs python
ground truth.  Deterministic (seeded) — no flaky generation.
"""

from __future__ import annotations

import collections
import random

import pytest

from dbt_lab_spark.functions.sketches import cms_build, cms_estimate, heavy_hitters

DEPTH, WIDTH, SEED = 5, 1024, 7


@pytest.fixture(scope="module")
def planted(spark):
    """~6000 items, Zipf-ish: item_0 dominates, long uniform tail."""
    rng = random.Random(13)
    items = []
    for rank in range(40):
        items += [f"item_{rank}"] * max(1, 3000 // (rank + 1))
    items += [f"tail_{rng.randint(0, 5000)}" for _ in range(3000)]
    rng.shuffle(items)
    truth = collections.Counter(items)
    df = spark.createDataFrame([(x,) for x in items], ["item"]).repartition(8)
    return df, truth


def test_cms_never_undercounts_and_bounds_error(spark, planted):
    df, truth = planted
    sketch = cms_build(df, "item", depth=DEPTH, width=WIDTH, seed=SEED)
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            sketch, df.distinct(), "item", depth=DEPTH, width=WIDTH, seed=SEED
        ).collect()
    }
    n = sum(truth.values())
    assert set(est) == set(truth)
    for item, true_n in truth.items():
        assert est[item] >= true_n, f"CMS undercounted {item}"
        # standard bound: err <= e*N/width w.p. 1-e^-depth; assert a
        # loose deterministic multiple to keep the test stable
        assert est[item] - true_n <= max(10, 3 * n // WIDTH), f"CMS overcount blew up on {item}"


def test_cms_sketch_is_bounded_and_mergeable(spark, planted):
    df, truth = planted
    sketch = cms_build(df, "item", depth=DEPTH, width=WIDTH, seed=SEED)
    assert sketch.count() <= DEPTH * WIDTH
    # mergeability: sketch(a ∪ b) == pointwise sum of sketch(a), sketch(b)
    a, b = df.randomSplit([0.5, 0.5], seed=3)
    merged = (
        cms_build(a, "item", depth=DEPTH, width=WIDTH, seed=SEED)
        .unionAll(cms_build(b, "item", depth=DEPTH, width=WIDTH, seed=SEED))
        .groupBy("d", "bucket")
        .sum("cnt")
    )
    whole = {(r["d"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    summed = {(r["d"], r["bucket"]): r["sum(cnt)"] for r in merged.collect()}
    assert whole == summed


def test_heavy_hitters_exact_vs_ground_truth(spark, planted):
    df, truth = planted
    n = sum(truth.values())
    for k in (8, 50, 200):
        got = {r["item"]: r["n"] for r in heavy_hitters(df, "item", k=k).collect()}
        want = {item: c for item, c in truth.items() if c * k >= n}
        assert got == want, f"k={k}"


def test_streaming_cms_equals_batch_cms(spark, planted, tmp_path):
    """The CMS build is a standard streaming aggregation (explode +
    groupBy counts): run it over the same rows as a file stream with
    update-mode foreachBatch folding into counters, and the final
    sketch equals the batch sketch — the mergeability that makes CMS
    the right frequency summary for unbounded streams."""
    import pyspark.sql.functions as F

    df, _ = planted
    src_dir = str(tmp_path / "src")
    df.coalesce(4).write.mode("overwrite").parquet(src_dir)

    batch_sketch = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build(
            spark.read.parquet(src_dir), "item", depth=DEPTH, width=WIDTH, seed=SEED
        ).collect()
    }

    acc: dict[tuple[int, int], int] = {}

    def fold(bdf, bid):
        for r in cms_build(bdf, "item", depth=DEPTH, width=WIDTH, seed=SEED).collect():
            key = (r["d"], r["bucket"])
            acc[key] = acc.get(key, 0) + r["cnt"]

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert acc == batch_sketch
