"""Incremental aggregate maintenance: folding batches into parquet
state must equal a full recompute — the decomposability contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.plans import Measure, incremental_update, read_state

MEASURES = [
    Measure("n_items", "l_quantity", "count"),
    Measure("sum_qty", "l_quantity", "sum"),
    Measure("min_price", "l_extendedprice", "min"),
    Measure("max_price", "l_extendedprice", "max"),
]


def test_incremental_equals_full_recompute(spark, sf_medium, tmp_path):
    li = scan(
        spark,
        Catalog(sf_medium),
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    state = str(tmp_path / "state")
    # three history batches arriving by ship year
    cuts = ["1997-01-01", "1999-01-01"]
    batches = [
        li.filter(F.col("l_shipdate") < cuts[0]),
        li.filter((F.col("l_shipdate") >= cuts[0]) & (F.col("l_shipdate") < cuts[1])),
        li.filter(F.col("l_shipdate") >= cuts[1]),
    ]
    keys = ["l_returnflag", "l_linestatus"]
    for b in batches:
        incremental_update(spark, state, b, keys, MEASURES)

    got = {
        (r.l_returnflag, r.l_linestatus): (r.n_items, r.sum_qty, r.min_price, r.max_price, round(r.avg_qty, 6))
        for r in read_state(spark, state, derived_avgs={"avg_qty": ("sum_qty", "n_items")}).collect()
    }
    full = {
        (r.l_returnflag, r.l_linestatus): (r.n_items, r.sum_qty, r.min_price, r.max_price, round(r.avg_qty, 6))
        for r in li.groupBy(*keys)
        .agg(
            F.count("l_quantity").alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
        )
        .collect()
    }
    assert got == full and len(got) == 6


def test_incremental_new_keys_appear(spark, tmp_path):
    state = str(tmp_path / "state2")
    b1 = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["k", "v"])
    b2 = spark.createDataFrame([("b", 5.0)], ["k", "v"])
    ms = [Measure("n", "v", "count"), Measure("s", "v", "sum")]
    incremental_update(spark, state, b1, ["k"], ms)
    incremental_update(spark, state, b2, ["k"], ms)
    got = {(r.k): (r.n, r.s) for r in read_state(spark, state).collect()}
    assert got == {"a": (2, 3.0), "b": (1, 5.0)}


def test_non_decomposable_rejected():
    with pytest.raises(ValueError):
        Measure("m", "v", "median")
