"""Sources & sinks beyond the reference's single table format.

The reference reads exactly one format (.mdtbl,
io/tables/TableResourceManager.java:36,653-700) and one index format
(.mdidx).  Parquet is this engine's canonical storage (BASELINE.json);
this module adds the free Spark upgrades:

  read_csv / read_json     declared-schema connectors (never inferSchema
                           — the engine's catalogue-driven posture,
                           catalogue/TableSchema.java:20)
  write_csv / write_json   interchange sinks
  write_partitioned        hive-style partitioned parquet — partition
                           pruning on the partition key is the Spark
                           analogue of the reference's index range scan
                           (qexec/IndexScanOperator.java:17): predicates
                           on the key skip whole directories
  write_bucketed_table     bucketBy sink: pre-shuffled storage so equal
                           bucketing on both sides of a join removes the
                           shuffle entirely (the 100 TB fact-fact join
                           answer; asserted shuffle-free in tests)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV source with a declared schema (no inference pass — one read,
    stable types)."""
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines source with a declared schema."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet sink.  Reads back with
    `spark.read.parquet(path)`; filters on the partition columns prune
    directories before any I/O (PartitionFilters in the scan node)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table in the session catalog.

    Two tables bucketed the same way join WITHOUT a shuffle — the
    storage-level answer to repeated fact-fact joins; with sort_cols the
    sort-merge join also skips its sorts.  (File-path parquet cannot
    carry bucket metadata, hence saveAsTable.)
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_columns: list[str],
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write parquet with rows sorted WITHIN each file by
    `sort_columns` — the data-layout half of predicate pushdown.

    Parquet keeps min/max statistics per row group; on a randomly
    ordered file every row group spans the whole value range, so a
    selective filter prunes nothing.  Sorting within partitions makes
    the row-group ranges narrow and disjoint, so point/range filters
    skip most of the file at scan time (the poor man's clustered
    index — what Delta's OPTIMIZE ZORDER generalizes to multiple
    dimensions).  sortWithinPartitions is a per-partition local sort:
    no shuffle; combine with repartition(col) first if you also want
    range-disjoint FILES."""
    df.sortWithinPartitions(*sort_columns).write.mode(mode).options(**options).parquet(path)
