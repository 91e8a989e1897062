"""fan_out_if_small (operators/scan.py): the size-gated repartition
that spreads a single-row-group scan across cores before a
compute-dense stage — r10 optimization round.

Contract pins:
  * small file-backed relation -> round-robin repartition to
    defaultParallelism (the whole point);
  * relation above the per-core byte threshold -> returned UNCHANGED
    (the 100 TB safety: a table big enough to split natively must
    never pay an extra full shuffle);
  * non-file-backed relation (local/range) -> returned unchanged;
  * values identical either way (repartition moves rows, never edits
    them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.scan import fan_out_if_small, scan


def test_small_scan_fans_out_to_default_parallelism(spark, sf_small):
    docs = scan(spark, Catalog(sf_small), "documents", ["doc_id", "text"])
    fanned = fan_out_if_small(docs)
    par = spark.sparkContext.defaultParallelism
    assert fanned.rdd.getNumPartitions() == par
    assert "RoundRobinPartitioning" in fanned._jdf.queryExecution().executedPlan().toString()


def test_large_scan_is_left_alone(spark, sf_small):
    docs = scan(spark, Catalog(sf_small), "documents", ["doc_id", "text"])
    # Force the gate shut: with a 0-byte-per-core threshold every
    # file-backed relation counts as "big enough to split natively".
    same = fan_out_if_small(docs, per_core_bytes=0)
    assert same is docs


def test_non_file_relation_is_left_alone(spark):
    rng = spark.range(100)
    assert fan_out_if_small(rng) is rng


def test_fan_out_preserves_rows_exactly(spark, sf_small):
    docs = scan(spark, Catalog(sf_small), "documents", ["doc_id", "text"])
    base = {(r["doc_id"], r["text"]) for r in docs.collect()}
    fanned = {(r["doc_id"], r["text"]) for r in fan_out_if_small(docs).collect()}
    assert fanned == base


def test_fan_out_composes_with_filter_pushdown(spark, sf_small):
    # The repartition sits ABOVE the scan: filters written before the
    # fan-out still reach the parquet reader.
    docs = scan(spark, Catalog(sf_small), "documents", ["doc_id", "text"])
    fanned = fan_out_if_small(docs.filter(F.col("doc_id") < 50))
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]" in plan
    assert fanned.count() == docs.filter(F.col("doc_id") < 50).count()
