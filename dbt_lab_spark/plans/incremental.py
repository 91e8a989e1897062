"""Incremental aggregate maintenance — the materialized-view pattern.

No reference counterpart (the reference recomputes every query; its
Hadoop path materializes temp tables per operator,
mapred/qexec/BulkProcessingOperator.java:57-65, but never maintains
them).  At 100 TB you cannot re-aggregate history per batch: you keep
a small ADDITIVE state table and fold each new batch into it.

Only decomposable aggregates participate (sum/count/min/max — and avg
derived as sum/count at read time): each is mergeable, so
    agg(full) == merge(agg(batch₁), ..., agg(batchₙ))
holds exactly, which the tests assert against a full recompute.  The
per-batch cost is one partial aggregate of the batch (map-side
combine) plus a merge keyed on the state table — independent of
history size.

State lives in plain parquet with atomic swap-by-rename; a table
format (Delta/Iceberg) would replace the swap with a transactional
MERGE but the plan shape is identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERGE_FN = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_INIT_FN = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class Measure:
    """One maintained aggregate: `fn(col)` exposed as `out`."""

    out: str
    col: str
    fn: str  # sum | count | min | max

    def __post_init__(self) -> None:
        if self.fn not in _INIT_FN:
            raise ValueError(f"non-decomposable aggregate {self.fn!r}; one of {sorted(_INIT_FN)}")


def partial_aggregate(batch: DataFrame, keys: Sequence[str], measures: Sequence[Measure]) -> DataFrame:
    """Aggregate one batch to state-table granularity."""
    return batch.groupBy(*keys).agg(
        *[_INIT_FN[m.fn](m.col).alias(m.out) for m in measures]
    )


def merge_aggregates(
    state: DataFrame, partial: DataFrame, keys: Sequence[str], measures: Sequence[Measure]
) -> DataFrame:
    """Fold a partial aggregate into the state table: union + re-reduce
    with each measure's MERGE function (count merges by sum)."""
    return (
        state.unionByName(partial)
        .groupBy(*keys)
        .agg(*[_MERGE_FN[m.fn](m.out).alias(m.out) for m in measures])
    )


def incremental_update(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    measures: Sequence[Measure],
) -> None:
    """Fold `batch` into the parquet state table at `state_path`
    (creating it on first call).  Swap-by-rename keeps readers from
    ever seeing a half-written state."""
    partial = partial_aggregate(batch, keys, measures)
    if os.path.exists(state_path):
        merged = merge_aggregates(spark.read.parquet(state_path), partial, keys, measures)
        _atomic_swap_write(merged, state_path)
    else:
        partial.write.mode("overwrite").parquet(state_path)


def _atomic_swap_write(df: DataFrame, state_path: str) -> None:
    """Materialize `df` beside `state_path`, then swap by rename —
    readers never observe a half-written state, and the plan may read
    the current state (the write lands in a different directory)."""
    tmp = tempfile.mkdtemp(dir=os.path.dirname(state_path) or ".", prefix=".inc_swap_")
    out = os.path.join(tmp, "state")
    df.write.mode("overwrite").parquet(out)
    old = state_path + ".__old"
    os.rename(state_path, old)
    os.rename(out, state_path)
    shutil.rmtree(old)
    shutil.rmtree(tmp, ignore_errors=True)


def cdc_apply(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    version_column: str | None = None,
) -> None:
    """Fold one CDC batch into the parquet state table by key upsert
    (operators/dml.py upsert_by_keys) with atomic swap — the
    foreachBatch body of a streaming MERGE pipeline.  With
    `version_column` the application is idempotent and order-
    independent across micro-batches (highest version wins), which is
    what makes the streaming replay/recovery semantics exact."""
    from dbt_lab_spark.operators.dml import upsert_by_keys

    if os.path.exists(state_path):
        merged = upsert_by_keys(spark.read.parquet(state_path), batch, keys, version_column)
        _atomic_swap_write(merged, state_path)
    else:
        deduped = upsert_by_keys(batch.limit(0), batch, keys, version_column)
        deduped.write.mode("overwrite").parquet(state_path)


def read_state(
    spark: SparkSession, state_path: str, derived_avgs: dict[str, tuple[str, str]] | None = None
) -> DataFrame:
    """Read the state table; `derived_avgs` adds avg columns computed
    from maintained (sum, count) pairs — out: (sum_col, count_col)."""
    df = spark.read.parquet(state_path)
    for out, (s, c) in (derived_avgs or {}).items():
        df = df.withColumn(out, F.col(s) / F.col(c))
    return df
