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

from dbt_lab_spark.workload import QueryDef


R6_QUERIES: list[QueryDef] = []
