"""Approximate aggregates (sketches) — error-bounded vs exact.

`q_approx_ndv` carries a tolerance-flag oracle (the query asserts
|approx-exact| <= 15% ~ 3 sigma inline and DuckDB expects TRUE); these
tests pin the tighter 10% (~2 sigma) bound per event type on the
current datasets — where a probabilistic excursion shows up as an
inspectable test failure, not a deterministic gate mismatch — plus
sketch mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.scan import scan


def test_approx_ndv_within_10pct_of_exact(spark, sf_medium):
    ev = scan(spark, Catalog(sf_medium), "events", ["event_type", "user_id"])
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("e"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= 0.10 * exact[k], (k, approx[k], exact[k])


def test_approx_percentile_within_tolerance(spark, sf_medium):
    li = scan(spark, Catalog(sf_medium), "lineitem", ["l_extendedprice"])
    got = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9], 10_000).alias("p")
    ).collect()[0]["p"]
    exact = li.agg(F.percentile("l_extendedprice", [0.5, 0.9]).alias("p")).collect()[0]["p"]
    # accuracy=10000 → rank error ≤ N/10000; prices are dense, so the
    # value error stays well under 1%
    for a, e in zip(got, exact):
        assert abs(a - e) <= 0.01 * e, (a, e)


def test_hll_sketch_merges_across_partitions(spark):
    """Partial HLL sketches merged across a repartition give the same
    estimate as a single-partition aggregate — the mergeability that
    makes the shuffle carry sketches, not values."""
    base = spark.range(50_000).select((F.col("id") % 7_919).alias("v"))
    one = base.coalesce(1).agg(F.approx_count_distinct("v", rsd=0.02).alias("a")).collect()[0]["a"]
    many = (
        base.repartition(32).agg(F.approx_count_distinct("v", rsd=0.02).alias("a")).collect()[0]["a"]
    )
    assert one == many
