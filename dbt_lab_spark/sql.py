"""SQL entry point — the analogue of the reference's
QueryProcessor.processQuery(String, ResultHandler)
(QueryProcessor.java:96-211): parse -> analyze -> optimize -> execute.

In the Spark engine all four phases are Catalyst's; this module binds
the catalog's tables as views and hands the string to spark.sql, after
a light validation pass that mirrors the reference's grammar posture:
the reference accepts only SELECT queries at this entry point
(INSERT/UPDATE/DELETE parse but are rejected, QueryProcessor.java:162-172).
Spark's SQL dialect is a strict superset of the reference grammar
(SELECT/FROM/WHERE conjunctions/GROUP BY/HAVING/ORDER BY, arithmetic
expressions, FROM-subqueries — parser/SelectQuery.java:20-45), so every
reference-shaped query runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_lab_spark.catalog import Catalog


class SqlProcessor:
    """processQuery-style façade: register catalog views once, then run
    SELECT strings."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog
        catalog.register_views(spark)

    def process_query(self, sql: str) -> DataFrame:
        stripped = sql.lstrip().lower()
        # Mirror the reference: only SELECT (incl. WITH ... SELECT) is
        # executable at this entry point (QueryProcessor.java:162-172).
        if not (stripped.startswith("select") or stripped.startswith("with")):
            raise ValueError(
                "only SELECT queries are supported at the SQL entry point "
                "(reference QueryProcessor.java:162-172); use the DML "
                "operators for insert/delete"
            )
        return self.spark.sql(sql)
