"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (group-customers golden-test shape,
                 TestPhysicalOperatorsIIIStudents.java:231-299) at sf0.001.
queries()      — every implemented query/operator from SURVEY.md §2
                 plus the beyond-reference training-data operators.
oracle_sql()   — DuckDB-equivalent SQL per query; omitted only for the
                 seeded-hash LSH operators (rows-only check), whose
                 semantics are pin-tested against exact recomputation in
                 tests/ instead.

ROTATING GATE SAMPLE (r4, VERDICT r3 #9).  The driver's 50-query
correctness gate has sampled the same reference-core queries every
round, so none of the ~180 r3-added queries have ever been gate-checked
(they are covered by the repo's own parity sweeps and the judge's spot
checks instead).  Proposal the driver can adopt verbatim — keep the
gate at 50 but recompose it each round as:

  * 20 FIXED ANCHORS (never rotate; regressions here are catastrophic):
    q_scan_filter q_count q_group_customers q_multiway q_merge_join
    q_theta_join q_grand_agg q_having q_sql_strict q_sql_entry
    q_tpch_q1 q_tpch_q3 q_tpch_q5 q_tpch_q6 q_tpch_q9 q_tpch_q18
    q_window_rank q_sessionize q_dedup_exact q_knn_bruteforce
  * 30 ROTATED: order the remaining oracle-backed queries by
    (rounds_since_last_sampled DESC, name ASC) and take the first 30 —
    deterministic given the CORRECTNESS_r*.json history, needs no
    builder input, and guarantees every oracle is gate-sampled at
    least once every ~9 rounds at the current surface size.
    For r4 specifically that yields the newest work first: the r3
    session-5..9 stats family (q_mann_whitney q_bh_fdr q_isotonic
    q_dtw q_cuped q_did q_sprt q_granger q_var_es q_eb_shrinkage ...),
    the r4 additions (q_lineitem_partitioned q_mp3_meta
    q_minhash_recall q_simhash_recall), and the format/graph operators
    (q_warc_ingest q_avro_ingest q_pagerank q_triangles q_entity_cc).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbt_lab_spark.workload import CORE_QUERIES

    flagship = next(q for q in CORE_QUERIES if q.name == "q_group_customers")
    return flagship.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dbt_lab_spark.workload import all_queries

    return {q.name: q.build for q in all_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same parquet views)."""
    from dbt_lab_spark.workload import all_queries

    return {q.name: q.oracle for q in all_queries() if q.oracle is not None}
