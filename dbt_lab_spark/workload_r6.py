"""Round-6 workload additions.

This round closes the r5 verdict list: watermark/late-data streaming
aggregation (SURVEY §2.9), schema evolution beyond additive (type
widening + column rename in the snapshot log), MP3 Layer III decode,
and the r4-advisor guard fixes.  Every query follows the repo
conventions: DataFrame-first plans, DuckDB oracle with identical
aliases, determinism per tests/oracle.py canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef


# ---------------------------------------------------------------------------
# Watermark / late-data streaming aggregation (VERDICT r5 #5, SURVEY §2.9)
# ---------------------------------------------------------------------------


def _q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling rollup through a REAL Structured-Streaming
    query with `withWatermark`, proving the late-data drop end-to-end:

    purchase events are replayed in three controlled micro-batches —
    (1) everything except a LATE SET (first-day rows with even
    event_id); (2) one future SENTINEL row at max(ts)+3h, which pushes
    the watermark to max(ts)+2h — past every real window end; (3) the
    late set, which the engine must now DROP from state.  The sentinel
    precedes the late file because Spark filters late events against
    the watermark of the PREVIOUS micro-batch (the SPARK-40925
    lateEvents/eviction split — measured: a late row arriving in the
    very batch the watermark first advances is still accepted), and its
    own window is never finalized, so it never reaches append output.

    The returned per-hour (count, cents-sum) rows therefore equal the
    batch aggregation WITHOUT the late rows — which is exactly what the
    DuckDB oracle recomputes (late sets are 3/35/331 rows at
    sf0.001/0.01/0.1, so on-time != full everywhere: a non-drop is a
    hash mismatch, not a vacuous pass).  Bounded state at 100 TB/day:
    the watermark evicts windows, append emits each window once
    (streaming/windows.py hourly_rollup_with_watermark)."""
    import os
    import shutil
    import tempfile

    from dbt_lab_spark.streaming.windows import (
        hourly_rollup_with_watermark,
        land_replay_file,
        land_replay_splits,
    )

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["event_id", "ts", "event_type", "value"],
        predicates=[F.col("event_type") == "purchase"],
    )
    base = ev.select(
        "event_id",
        "ts",
        (money("value") * 100).cast("long").alias("cents"),
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0))
        .cast("long")
        .alias("d"),
    )
    bounds = base.agg(F.min("d").alias("d0"), F.max("ts").alias("mx")).first()
    tmp = tempfile.mkdtemp(prefix="wmstream_")
    try:
        src = os.path.join(tmp, "src")
        payload = ["ts", "cents"]
        if bounds["d0"] is None:  # empty events: stream two empty files
            land_replay_file(base.select(*payload), src, 0, "ontime")
            land_replay_file(base.select(*payload), src, 1, "late")
        else:
            is_late = (F.col("d") == F.lit(bounds["d0"])) & (
                F.col("event_id") % 2 == 0
            )
            sentinel = spark.createDataFrame(
                [(1,)], "one int"
            ).select(
                (F.lit(bounds["mx"]) + F.expr("INTERVAL 3 HOURS")).alias("ts"),
                F.lit(0).cast("long").alias("cents"),
                F.lit(1).alias("g"),
            )
            staged = base.select(
                *payload, F.when(is_late, 2).otherwise(0).alias("g")
            ).unionByName(sentinel)
            # one write job stages all three micro-batches (0 = on-time,
            # 1 = sentinel, 2 = late — sentinel FIRST so the late filter
            # sees a settled watermark, see docstring)
            land_replay_splits(staged, src, "g")
        out = hourly_rollup_with_watermark(
            spark, src, "ts timestamp, cents long",
            checkpoint_dir=os.path.join(tmp, "ckpt"), watermark="1 hour",
        )
        return out.orderBy("h")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_WATERMARK = """
WITH p AS (
  SELECT event_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS d
  FROM events WHERE event_type = 'purchase'
), d0 AS (
  SELECT MIN(d) AS d0 FROM p
)
SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM p, d0
WHERE NOT (d = d0 AND event_id % 2 = 0)
GROUP BY 1 ORDER BY 1
"""


R6_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_stream_watermark", _q_stream_watermark, _SQL_STREAM_WATERMARK,
        "watermark late-data drop: streamed hourly rollup == batch minus late set",
    ),
]
