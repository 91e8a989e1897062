"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (group-customers golden-test shape,
                 TestPhysicalOperatorsIIIStudents.java:231-299) at sf0.001.
queries()      — every implemented query/operator from SURVEY.md §2
                 plus the beyond-reference training-data operators.
oracle_sql()   — DuckDB-equivalent SQL per query; omitted only for the
                 seeded-hash LSH operators (rows-only check), whose
                 semantics are pin-tested against exact recomputation in
                 tests/ instead.
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
