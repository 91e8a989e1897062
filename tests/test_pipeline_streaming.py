"""Tests: pipeline DAG layer, streaming windows, multimodal plumbing,
SQL entry point, DML operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.dml import delete_by_keys, insert_into
from dbt_lab_spark.plans import Pipeline
from dbt_lab_spark.sql import SqlProcessor
from dbt_lab_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    tumbling_window_agg,
)
from dbt_lab_spark.llm.multimodal import extract_features, make_fake_assets, sample_frames


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


def test_pipeline_dag_order_and_results(spark, sf_medium, tmp_path):
    cat = Catalog(sf_medium)
    p = Pipeline(spark, workdir=str(tmp_path))
    p.add("orders", lambda up: cat.table(spark, "orders"))
    p.add(
        "big_orders",
        lambda up: up["orders"].filter(F.col("o_totalprice") > 300000),
        depends_on=("orders",),
        materialize="parquet",
    )
    p.add(
        "by_status",
        lambda up: up["big_orders"].groupBy("o_orderstatus").agg(F.count("*").alias("n")),
        depends_on=("big_orders",),
    )
    res = p.run()
    total = res["big_orders"].count()
    assert total == res["by_status"].agg(F.sum("n")).collect()[0][0]
    # parquet materialization actually wrote files
    assert (tmp_path / "big_orders").exists()


def test_pipeline_rejects_cycles_and_unknowns(spark):
    p = Pipeline(spark)
    p.add("a", lambda up: None, depends_on=("b",))
    p.add("b", lambda up: None, depends_on=("a",))
    with pytest.raises(ValueError, match="cycle"):
        p.run()
    p2 = Pipeline(spark)
    p2.add("a", lambda up: None, depends_on=("zzz",))
    with pytest.raises(ValueError, match="unknown"):
        p2.run()


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------


def test_streaming_tumbling_matches_batch(spark, sf_medium):
    """The SAME aggregation over readStream must equal the batch result
    — the defining property of Structured Streaming."""
    cat = Catalog(sf_medium)
    batch = tumbling_window_agg(cat.table(spark, "events"))
    stream = tumbling_window_agg(read_events_stream(spark, sf_medium))
    got = run_stream_to_memory(spark, stream, "t_tumbling")
    b = {(r["w"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
         for r in batch.collect()}
    s = {(r["w"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
         for r in got.collect()}
    assert b == s and len(b) > 0


def test_streaming_session_window_runs(spark, sf_medium):
    stream = session_window_agg(read_events_stream(spark, sf_medium))
    got = run_stream_to_memory(spark, stream, "t_session")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_multimodal_feature_extraction(spark):
    assets = make_fake_assets(spark, n=64).repartition(8)
    feats = extract_features(assets, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows:
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # normalized histogram
        assert r["n_bytes"] >= 256
    # determinism across runs
    again = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    assert all(again[r["asset_id"]] == r["feature"] for r in rows)


def test_multimodal_decode_stub_raises_without_fake(spark):
    assets = make_fake_assets(spark, n=4)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_features(assets, fake_decode=False).collect()


def test_multimodal_frame_sampling(spark):
    assets = make_fake_assets(spark, n=30)
    frames = sample_frames(assets, every_ms=5000)
    rows = frames.collect()
    assert all(r["frame_ts_ms"] % 5000 == 0 for r in rows)
    # every video asset yields at least one frame (ts=0)
    n_videos = assets.filter(F.col("media_type") == "video").count()
    assert frames.select("asset_id").distinct().count() == n_videos


# ---------------------------------------------------------------------------
# SQL entry point
# ---------------------------------------------------------------------------


def test_sql_entry_point_reference_shaped_query(spark, sf_medium):
    proc = SqlProcessor(spark, Catalog(sf_medium))
    df = proc.process_query(
        """
        SELECT n_name, COUNT(c_custkey) AS num_customers
        FROM customer, nation
        WHERE c_nationkey = n_nationkey AND c_acctbal > 0
        GROUP BY n_name
        HAVING COUNT(c_custkey) > 10
        ORDER BY n_name
        """
    )
    rows = df.collect()
    assert len(rows) > 0 and rows == sorted(rows, key=lambda r: r["n_name"])


def test_sql_entry_point_rejects_dml(spark, sf_medium):
    proc = SqlProcessor(spark, Catalog(sf_medium))
    with pytest.raises(ValueError, match="only SELECT"):
        proc.process_query("DELETE FROM orders WHERE o_orderkey = 1")


# ---------------------------------------------------------------------------
# DML (reference Insert/Delete — F8)
# ---------------------------------------------------------------------------


def test_insert_append_and_delete_by_keys(spark, sf_medium, tmp_path):
    cat = Catalog(sf_medium)
    path = str(tmp_path / "nation_copy")
    nation = cat.table(spark, "nation")
    nation.write.parquet(path)
    # insert: append 5 new rows
    extra = nation.limit(5).withColumn("n_nationkey", F.col("n_nationkey") + 1000)
    insert_into(extra, path)
    assert spark.read.parquet(path).count() == 30
    # delete-by-key as anti-join transformation
    survivors = delete_by_keys(
        spark.read.parquet(path), extra.select("n_nationkey"), keys=["n_nationkey"]
    )
    assert survivors.count() == 25
    assert survivors.filter(F.col("n_nationkey") >= 1000).count() == 0


def test_update_where_conditional_rewrite(spark, sf_medium):
    from dbt_lab_spark.operators import update_where

    cat = Catalog(sf_medium)
    nation = cat.table(spark, "nation")
    updated = update_where(
        nation,
        F.col("n_regionkey") == 0,
        {"n_name": F.lower(F.col("n_name")), "n_regionkey": F.lit(99)},
    )
    rows = {r.n_nationkey: r for r in updated.collect()}
    orig = {r.n_nationkey: r for r in nation.collect()}
    assert set(rows) == set(orig)
    changed = [k for k, r in orig.items() if r.n_regionkey == 0]
    assert changed
    for k, r in orig.items():
        if k in changed:
            assert rows[k].n_name == r.n_name.lower() and rows[k].n_regionkey == 99
        else:
            assert rows[k].n_name == r.n_name and rows[k].n_regionkey == r.n_regionkey
    with pytest.raises(KeyError):
        update_where(nation, F.lit(True), {"nope": F.lit(1)})


def test_stateful_sessionize_matches_batch_closed_sessions(spark, sf_medium):
    """applyInPandasWithState sessionizer vs the lag-cumsum batch
    sessionizer: on a bounded input the stateful operator emits every
    session except each user's last (which stays open in state)."""
    from dbt_lab_spark.streaming import read_events_stream, stateful_sessionize
    from dbt_lab_spark.workload_beyond import _q_sessionize

    stream = stateful_sessionize(
        read_events_stream(spark, sf_medium).select("user_id", "ts", "value")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stateful_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events): round(r.sum_value, 4)
        for r in spark.sql("SELECT * FROM t_stateful_sessions").collect()
    }

    batch = _q_sessionize(spark, sf_medium).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events): round(r.sum_value, 4)
        for r in batch
        if r.session_seq != last_seq[r.user_id]
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)


def test_catalog_statistics_and_cbo_analyze(spark, sf_medium):
    """Catalog statistics (the catalogue.xml analogue) and the ANALYZE
    path that feeds Spark CBO rowCounts."""
    cat = Catalog(sf_medium)
    stats = cat.compute_statistics(spark, ("nation", "orders"))
    assert stats["nation"].row_count == 25
    assert stats["orders"].row_count > 0
    op = stats["orders"].columns["o_totalprice"]
    assert op.low < op.high and op.ndv > 100
    # key column: NDV approximation within 10% of cardinality
    # (approx_count_distinct default rsd is 5%)
    ok = stats["orders"].columns["o_orderkey"]
    assert abs(ok.ndv - stats["orders"].row_count) / stats["orders"].row_count < 0.10

    cat.analyze(spark, ("nation",))
    cbo = (
        spark.sql("SELECT * FROM dbt_lab.nation")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
    )
    assert cbo.rowCount().isDefined() and cbo.rowCount().get() == 25


def test_streaming_parquet_sink_round_trip(spark, sf_medium, tmp_path):
    """readStream -> transform -> writeStream to a durable parquet sink
    with checkpointing; the sink contents must equal the batch result
    (append mode requires the watermark to close windows, so only
    watermark-expired windows land — assert subset + exact values)."""
    from dbt_lab_spark.streaming import read_events_stream, tumbling_window_agg

    out_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    agg = tumbling_window_agg(read_events_stream(spark, sf_medium), watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # Append mode emits expired windows in a NO-DATA micro-batch
        # that fires after the watermark advances; processAllAvailable
        # only waits for *data* batches, so poll until the async
        # no-data batch lands in the sink (flaked under load otherwise).
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            files = [p for p in (tmp_path / "sink").glob("part-*") if p.stat().st_size > 0]
            if files and spark.read.parquet(out_dir).count() > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    sunk = spark.read.parquet(out_dir)
    got = {
        (r["w"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in sunk.collect()
    }
    cat = Catalog(sf_medium)
    want = {
        (r["w"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in tumbling_window_agg(cat.table(spark, "events")).collect()
    }
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])


def test_streaming_dedup_matches_batch(spark, sf_medium):
    """Streaming dropDuplicates over the events stream == batch distinct
    on the same keys (first-occurrence-wins; key set identical)."""
    from dbt_lab_spark.streaming import read_events_stream, streaming_dedup

    cat = Catalog(sf_medium)
    batch_keys = {
        r["user_id"] for r in cat.table(spark, "events").select("user_id").distinct().collect()
    }
    stream = streaming_dedup(
        read_events_stream(spark, sf_medium).select("user_id", "ts"), ["user_id"]
    )
    got = run_stream_to_memory(spark, stream, "t_dedup", output_mode="append")
    keys = [r["user_id"] for r in got.collect()]
    assert len(keys) == len(set(keys)) == len(batch_keys)
    assert set(keys) == batch_keys


def test_streaming_dedup_within_watermark_bounded_state(spark, sf_medium):
    """dropDuplicatesWithinWatermark: still no duplicates inside one
    watermark window on the bounded input; every key appears."""
    from dbt_lab_spark.streaming import read_events_stream, streaming_dedup

    stream = streaming_dedup(
        read_events_stream(spark, sf_medium).select("user_id", "ts"),
        ["user_id"],
        watermark="10 minutes",
        within_watermark=True,
    )
    got = run_stream_to_memory(spark, stream, "t_dedup_wm", output_mode="append")
    keys = [r["user_id"] for r in got.collect()]
    cat = Catalog(sf_medium)
    n_users = cat.table(spark, "events").select("user_id").distinct().count()
    # single micro-batch: at least every key once, no more than once here
    assert len(set(keys)) == n_users
    assert len(keys) == len(set(keys))


def test_stateful_sessionize_event_time_timeout_drains_idle(spark, sf_medium):
    """Event-time-timeout variant: emits every NoTimeout-closed session
    PLUS the open sessions whose (last_ts + gap) the final watermark
    passed — state drains for idle users instead of growing forever."""
    from dbt_lab_spark.streaming import (
        read_events_stream,
        stateful_sessionize_event_time,
    )
    from dbt_lab_spark.workload_beyond import _q_sessionize

    stream = stateful_sessionize_event_time(
        read_events_stream(spark, sf_medium).select("user_id", "ts", "value"),
        gap="30 minutes",
        watermark_delay="1 minute",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_et_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM t_et_sessions").collect()
    }

    batch = _q_sessionize(spark, sf_medium).collect()
    max_ts = max(r.session_end for r in batch)
    from datetime import timedelta

    watermark = max_ts - timedelta(minutes=1)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch
        if (r.session_end + timedelta(minutes=30)) <= watermark
    }
    # every session the watermark passed must be emitted; sessions still
    # inside the horizon may stay open in state
    assert want <= got, f"missing {len(want - got)} drained sessions"
    extra = got - want
    for u, s, e, n in extra:
        assert (e + timedelta(minutes=30)) > watermark, (u, s, e)


def test_upsert_by_keys_merge_semantics(spark):
    """MERGE: update wins on collision, inserts append, within-batch
    duplicates dedup, and version_column makes stale updates lose."""
    from dbt_lab_spark.operators import upsert_by_keys

    table = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 5), (3, "c", 1)], ["k", "v", "ver"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 1), (4, "d2", 2)], ["k", "v", "ver"]
    )
    # source-precedence: update always wins, batch dups dedup by precedence
    got = {
        (r.k, r.v) for r in upsert_by_keys(table, updates, ["k"]).select("k", "v").collect()
    }
    assert got == {(1, "a"), (2, "b2"), (3, "c"), (4, "d2")} or got == {
        (1, "a"), (2, "b2"), (3, "c"), (4, "d"),
    }
    # version-precedence: table row (2,'b',ver=5) beats stale update ver=2
    got_v = {
        (r.k, r.v)
        for r in upsert_by_keys(table, updates, ["k"], version_column="ver")
        .select("k", "v")
        .collect()
    }
    assert got_v == {(1, "a"), (2, "b"), (3, "c"), (4, "d2")}
    # schema mismatch rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsert_by_keys(table, updates.drop("ver"), ["k"])


def test_stream_stream_interval_join_matches_batch_range_join(spark, sf_medium):
    """Stream-stream interval join (clicks ⋈ purchases within 1h by
    user) == the batch range_join on the same inputs.  The time bound
    in the join condition is what lets streaming evict state."""
    from dbt_lab_spark.operators.joins import range_join
    from dbt_lab_spark.streaming import read_events_stream, stream_stream_interval_join

    src = read_events_stream(spark, sf_medium)
    clicks = src.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = src.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ts_r"),
        F.col("event_id").alias("purchase_id"),
    )
    stream = stream_stream_interval_join(
        clicks, purchases, key="user_id", within="1 hour"
    ).select("click_id", "purchase_id")
    q = stream.writeStream.outputMode("append").format("memory").queryName("t_ssj").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.click_id, r.purchase_id) for r in spark.sql("SELECT * FROM t_ssj").collect()}

    cat = Catalog(sf_medium)
    ev = cat.table(spark, "events")
    bl = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    br = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in range_join(bl, br, "user_id", "ts", "p_ts", 0, 3_600_000).collect()
    }
    assert got == want and len(want) > 0


def test_multimodal_real_decode_streaming_matches_batch(spark, tmp_path):
    """extract_features(fake_decode=False) is a map-only mapInPandas —
    it must run unchanged under readStream and produce the same
    features as the batch pass over the same asset files."""
    from dbt_lab_spark.llm.multimodal import ASSET_SCHEMA, extract_features, make_real_assets

    assets = make_real_assets(spark, n=16)
    path = str(tmp_path / "assets")
    assets.write.parquet(path)
    batch = {
        r["asset_id"]: r["feature"]
        for r in extract_features(spark.read.schema(ASSET_SCHEMA).parquet(path),
                                  fake_decode=False).collect()
    }
    stream = spark.readStream.schema(ASSET_SCHEMA).parquet(path)
    q = (
        extract_features(stream, fake_decode=False)
        .writeStream.format("memory")
        .queryName("mm_decode")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["asset_id"]: r["feature"]
            for r in spark.sql("SELECT * FROM mm_decode").collect()
        }
    finally:
        q.stop()
    assert got == batch and len(got) == 16


def test_ewma_by_key_hand_computed_and_ties(spark):
    from dbt_lab_spark.streaming.stateful import ewma_by_key

    # hand recursion, alpha=0.5, adjust=False: e=[10, 7, 5.5, 4.75]
    rows = [(1, i, float(v)) for i, v in enumerate([10, 4, 4, 4])]
    df = spark.createDataFrame(rows, "k long, o long, value double")
    out = ewma_by_key(df, "k", ["o"], "value", alpha=0.5).first()
    assert out["last_ewma"] == pytest.approx(4.75)
    assert out["n_events"] == 4

    # tie-broken ordering is deterministic: same ts, event_id decides
    tied = spark.createDataFrame(
        [(1, 0, 7, 100.0), (1, 0, 3, 0.0)], "k long, ts long, eid long, value double"
    )
    a = ewma_by_key(tied, "k", ["ts", "eid"], "value").first()["last_ewma"]
    b = ewma_by_key(tied.repartition(5), "k", ["ts", "eid"], "value").first()["last_ewma"]
    # eid 3 first (0.0), then eid 7 (100.0): e = 0.5*0 + 0.5*100 = 50
    assert a == b == pytest.approx(50.0)


def test_ewma_matches_closed_form_long_series(spark):
    import numpy as np

    from dbt_lab_spark.streaming.stateful import ewma_by_key

    rng = np.random.default_rng(8)
    vals = rng.normal(100, 20, 500)
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "k long, o long, value double"
    )
    got = ewma_by_key(df, "k", ["o"], "value", alpha=0.3).first()["last_ewma"]
    a, n = 0.3, len(vals)
    closed = (1 - a) ** (n - 1) * vals[0] + a * sum(
        (1 - a) ** (n - 1 - i) * vals[i] for i in range(1, n)
    )
    assert got == pytest.approx(closed, rel=1e-9)
