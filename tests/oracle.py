"""DuckDB-as-oracle comparison harness, mimicking the driver's t2 gate:
row-count + schema(names) + order-insensitive value hash.

Canonicalization (FIXTURES.md §3): sort columns by name, round doubles
to 4 decimals, stringify rows, hash the sorted multiset.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame

from dbt_lab_spark.catalog import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 4):.4f}"
    if isinstance(v, Decimal):
        return f"{round(float(v), 4):.4f}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(",".join(_canon_value(r[i]) for i in order) for r in rows)


def compare(sdf: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Run Spark DF and oracle SQL; return a comparison report."""
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    report = {
        "spark_count": len(spark_rows),
        "duck_count": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "count_match": len(spark_rows) == len(duck_rows),
        "schema_match": sorted(spark_cols) == sorted(duck_cols),
    }
    if report["count_match"] and report["schema_match"]:
        s = _canon_rows(spark_cols, spark_rows)
        d = _canon_rows(duck_cols, duck_rows)
        report["value_match"] = s == d
        if not report["value_match"]:
            diff_s = [r for r in s if r not in set(d)][:5]
            diff_d = [r for r in d if r not in set(s)][:5]
            report["spark_only"] = diff_s
            report["duck_only"] = diff_d
    else:
        report["value_match"] = False
    report["ok"] = report["count_match"] and report["schema_match"] and report["value_match"]
    return report
