"""Scan operators.

Reference: TableScanOperator (qexec/TableScanOperator.java:17; factory
OperatorFactory.java:68-81) — full scan with a projection map
(`producedColumnIndexes`) and conjunctive pushed-down predicates
(`LowLevelPredicate[]`), plus page prefetching.  IndexScanOperator
(qexec/IndexScanOperator.java:17) — ordered key-range scan.

Spark mapping: `.select(...).filter(...)` on a parquet read.  Catalyst
pushes both the filter and the projection into the parquet scan
(PushedFilters / ReadSchema in `.explain("formatted")`), which subsumes
the reference's page-level predicate evaluation (TablePage.java:182) and
its B-tree access paths: parquet row-group min/max pruning plays the role
of the index.  Prefetching is the vectorized parquet reader's job.
"""

from __future__ import annotations

import os

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import between, conjunction

# fan_out_if_small: repartition only when the scan's backing bytes are
# below this many bytes PER CORE.  4 MB mirrors
# spark.sql.files.openCostInBytes — the point below which Spark itself
# considers a split not worth a task, i.e. the scan physically cannot
# produce enough row-group splits to feed the cores, and the round-trip
# shuffle of the whole relation costs less than one I/O-sized split per
# core.  Above it, native file splitting provides the parallelism and
# the repartition would be a pure extra shuffle (at 100 TB: a
# catastrophic one), so the helper is a no-op there by construction.
FAN_OUT_PER_CORE_BYTES = 4 * 1024 * 1024


def fan_out_if_small(df: DataFrame, per_core_bytes: int = FAN_OUT_PER_CORE_BYTES) -> DataFrame:
    """Round-robin repartition a SMALL scan to the session's core count
    before a compute-dense stage (tokenize/explode/n-gram/model math).

    Single-row-group parquet files cap the scan — and every map-side
    pipeline fused onto it — at ONE task regardless of cores (guide
    §2.4 stragglers: the partition count, not the data, is the
    bottleneck).  The condition is measured from the relation's actual
    backing files, so it is scale-adaptive, not a local-mode constant:
    a table big enough to split natively skips the repartition
    entirely.
    """
    try:
        files = [f[7:] if f.startswith("file:") else f for f in df.inputFiles()]
        if not files:
            return df
        total = sum(os.path.getsize(f) for f in files)
    except Exception:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if total >= par * per_core_bytes:
        return df
    return df.repartition(par)


def scan(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    columns: Sequence[str] | None = None,
    predicates: Sequence[Column] | None = None,
) -> DataFrame:
    """TableScan with projection map + conjunctive pushdown predicates.

    `columns=None` produces all columns (the reference's identity map);
    predicates are AND-combined exactly like `LowLevelPredicate[]`
    (OperatorFactory.java:68-81).  Filter-before-select keeps predicates
    valid on non-projected columns; Catalyst prunes to the union of
    referenced columns either way.
    """
    df = catalog.table(spark, table)
    if predicates:
        df = df.filter(conjunction(predicates))
    if columns is not None:
        df = df.select(*columns)
    return df


def index_scan(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    key_column: str,
    start_key: object = None,
    stop_key: object = None,
    start_inclusive: bool = True,
    stop_inclusive: bool = True,
    ordered: bool = True,
) -> DataFrame:
    """IndexScan: keys in a range, in key order.

    Reference signature createIndexScanOperator(index, startKey, stopKey,
    startIncl, stopIncl) (api/AbstractExtensionFactory.java:236).  The
    equality-lookup and BETWEEN-lookup factories
    (OperatorFactory.java:91-98,114-123) are the degenerate cases
    start==stop and one-sided bounds.  On parquet this is a pruned scan +
    optional sort; Catalyst drops the sort when a downstream requirement
    already provides order.
    """
    df = catalog.table(spark, table).select(key_column)
    if start_key is not None or stop_key is not None:
        df = df.filter(
            between(key_column, start_key, stop_key, start_inclusive, stop_inclusive)
        )
    return df.sort(key_column) if ordered else df
