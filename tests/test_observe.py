"""Single-pass observability (`operators/observe.py`): metrics ride the
materializing action — no second scan — and must equal the same
aggregates computed directly."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators import observed
from dbt_lab_spark.operators.scan import scan

from .conftest import SF_MEDIUM


def test_observed_metrics_match_direct_aggregates(spark):
    cat = Catalog(SF_MEDIUM)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "source"])
    gate = F.length("text") >= 100

    obs = Observation("curation_audit")
    audited = observed(
        docs,
        obs,
        {
            "n_rows": F.count(F.lit(1)),
            "n_pass_gate": F.sum(gate.cast("long")),
            "n_null_text": F.sum(F.col("text").isNull().cast("long")),
            # DISTINCT aggs are rejected in observed metrics (must be
            # mergeable); the HLL sketch is the NDV audit that works
            "n_sources": F.approx_count_distinct("source"),
        },
    )
    kept = audited.filter(gate).count()  # the ONE action; metrics ride it

    direct = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(gate.cast("long")).alias("n_pass_gate"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.count_distinct("source").alias("n_sources"),
    ).collect()[0]

    got = obs.get
    assert got["n_rows"] == direct["n_rows"]
    assert got["n_pass_gate"] == direct["n_pass_gate"] == kept
    assert got["n_null_text"] == direct["n_null_text"]
    assert abs(got["n_sources"] - direct["n_sources"]) <= 0.1 * direct["n_sources"]


def test_observed_metrics_in_streaming_progress(spark, tmp_path):
    """The same observe() call surfaces per-batch metrics in
    StreamingQueryProgress.observedMetrics — one code path for batch
    and streaming."""
    cat = Catalog(SF_MEDIUM)
    batch = scan(spark, cat, "documents", ["doc_id", "text"])
    # file-source streaming needs a directory; stage one small file
    stage = str(tmp_path / "docs")
    batch.limit(500).write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(batch.schema).parquet(stage)

    audited = observed(
        stream, "stream_audit", {"n_rows": F.count(F.lit(1))}
    )
    q = (
        audited.writeStream.outputMode("append")
        .format("noop")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p.get("observedMetrics")]
    finally:
        q.stop()
    total = sum(p["observedMetrics"]["stream_audit"]["n_rows"] for p in progresses)
    assert total == 500
