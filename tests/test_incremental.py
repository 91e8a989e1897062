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


def test_streaming_cdc_apply_foreachbatch(spark, tmp_path):
    """End-to-end streaming MERGE: CDC rows arrive as files, a
    foreachBatch sink folds each micro-batch into parquet state with
    cdc_apply (versioned upsert + atomic swap).  The final state must
    equal a single batch upsert of all updates — regardless of how the
    stream chopped them into micro-batches (version wins, idempotent)."""
    from pyspark.sql import types as T

    from dbt_lab_spark.plans.incremental import cdc_apply
    from dbt_lab_spark.operators.dml import upsert_by_keys

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    cdc_dir = str(tmp_path / "cdc")
    state = str(tmp_path / "state")
    base = [(i, f"base_{i}", 0) for i in range(20)]
    updates = (
        [(i, f"upd_a_{i}", 2) for i in range(0, 10)]          # update half
        + [(i, f"upd_late_{i}", 1) for i in range(0, 5)]      # late, loses to ver 2
        + [(i, f"new_{i}", 1) for i in range(20, 25)]         # inserts
        + [(7, "dup_low", 1), (7, "dup_high", 3)]             # within-batch dup
    )
    spark.createDataFrame(base, schema).write.mode("overwrite").parquet(state)
    # three separate files => multiple micro-batches with maxFilesPerTrigger=1
    for i, chunk in enumerate([updates[:7], updates[7:14], updates[14:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(cdc_dir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(cdc_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: cdc_apply(spark, state, bdf, ["k"], version_column="ver")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(state).collect()}
    want_df = upsert_by_keys(
        spark.createDataFrame(base, schema),
        spark.createDataFrame(updates, schema),
        ["k"],
        version_column="ver",
    )
    want = {r["k"]: (r["v"], r["ver"]) for r in want_df.collect()}
    assert got == want
    assert got[7] == ("dup_high", 3)
    assert got[3] == ("upd_a_3", 2)
    assert got[22] == ("new_22", 1)


def test_incremental_join_matches_full_recompute(spark, tmp_path):
    """After every append-only batch, the maintained view equals a
    from-scratch join of everything seen so far — exact multiset
    equality, including join-key duplicates."""
    from dbt_lab_spark.plans.incremental import JoinState, incremental_join_update

    state = JoinState(
        str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "v")
    )
    a_batches = [
        [(1, "a1"), (2, "a2")],
        [(2, "a3"), (3, "a4")],          # duplicate key 2
        [],
        [(4, "a5")],
    ]
    b_batches = [
        [(1, 10.0)],
        [(2, 20.0), (2, 21.0)],          # duplicate key 2 on b too
        [(3, 30.0), (9, 99.0)],          # 9 never matches
        [],
    ]
    seen_a: list = []
    seen_b: list = []
    for da_rows, db_rows in zip(a_batches, b_batches):
        da = (
            spark.createDataFrame(da_rows, "k long, av string") if da_rows else None
        )
        db = spark.createDataFrame(db_rows, "k long, bv double") if db_rows else None
        incremental_join_update(spark, state, da, db, on=["k"])
        seen_a += da_rows
        seen_b += db_rows
        full = (
            spark.createDataFrame(seen_a, "k long, av string")
            .join(spark.createDataFrame(seen_b, "k long, bv double"), ["k"])
            .collect()
        )
        view = spark.read.parquet(state.view_path).collect()
        key = lambda r: (r["k"], r["av"], r["bv"])
        assert sorted(map(key, view)) == sorted(map(key, full))
    # sanity: multiset semantics really exercised (key 2: 2 a-rows x 2 b-rows)
    final = spark.read.parquet(state.view_path)
    assert final.filter("k = 2").count() == 4
    assert final.filter("k = 9").count() == 0


def test_incremental_join_first_batch_only_one_side(spark, tmp_path):
    from dbt_lab_spark.plans.incremental import JoinState, incremental_join_update

    state = JoinState(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "v"))
    da = spark.createDataFrame([(1, "x")], "k long, av string")
    incremental_join_update(spark, state, da, None, on=["k"])
    # no b yet: no view rows, but a-state is persisted
    import os

    assert not os.path.exists(str(tmp_path / "v"))
    assert spark.read.parquet(state.a_path).count() == 1
    db = spark.createDataFrame([(1, 5.0)], "k long, bv double")
    incremental_join_update(spark, state, None, db, on=["k"])
    assert spark.read.parquet(state.view_path).count() == 1


def test_incremental_join_under_streaming_foreachbatch(spark, tmp_path):
    """The deployment shape of join IVM: a readStream of fact deltas
    drives incremental_join_update from foreachBatch, maintaining the
    view as batches arrive; the final view equals a from-scratch join
    of everything streamed."""
    from dbt_lab_spark.plans.incremental import JoinState, incremental_join_update

    dim_rows = [(k, f"dim{k}") for k in range(5)]
    dim = spark.createDataFrame(dim_rows, "k long, dv string")
    state = JoinState(str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "v"))
    # the dimension side is loaded once (delta_b on the first batch)
    incremental_join_update(spark, state, None, dim, on=["k"])

    src = str(tmp_path / "facts")
    import os

    os.makedirs(src)
    all_facts = []
    for batch_no in range(3):
        rows = [(k, f"f{batch_no}_{k}") for k in range(batch_no, batch_no + 4)]
        all_facts += rows
        spark.createDataFrame(rows, "k long, fv string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema("k long, fv string").parquet(src)

    def _apply(batch_df, batch_id):
        incremental_join_update(spark, state, batch_df, None, on=["k"])

    q = stream.writeStream.foreachBatch(_apply).trigger(availableNow=True).start()
    q.awaitTermination(120)

    want = (
        spark.createDataFrame(all_facts, "k long, fv string")
        .join(dim, ["k"])
        .collect()
    )
    got = spark.read.parquet(state.view_path).collect()
    key = lambda r: (r["k"], r["fv"], r["dv"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == len([r for r in all_facts if r[0] < 5])
