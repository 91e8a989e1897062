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

from dbt_lab_spark.plans.snapshots import _read_pq

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
        merged = merge_aggregates(_read_pq(spark, state_path), partial, keys, measures)
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
    if os.path.exists(state_path):
        old = state_path + ".__old"
        os.rename(state_path, old)
        os.rename(out, state_path)
        shutil.rmtree(old)
    else:  # first write: plain rename into place
        os.rename(out, state_path)
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
        merged = upsert_by_keys(_read_pq(spark, state_path), batch, keys, version_column)
        _atomic_swap_write(merged, state_path)
    else:
        deduped = upsert_by_keys(batch.limit(0), batch, keys, version_column)
        deduped.write.mode("overwrite").parquet(state_path)


def read_state(
    spark: SparkSession, state_path: str, derived_avgs: dict[str, tuple[str, str]] | None = None
) -> DataFrame:
    """Read the state table; `derived_avgs` adds avg columns computed
    from maintained (sum, count) pairs — out: (sum_col, count_col)."""
    df = _read_pq(spark, state_path)
    for out, (s, c) in (derived_avgs or {}).items():
        df = df.withColumn(out, F.col(s) / F.col(c))
    return df


@dataclass(frozen=True)
class JoinState:
    """Paths for an incrementally-maintained join view: the two
    accumulated inputs and the materialized join result."""

    a_path: str
    b_path: str
    view_path: str


def incremental_join_update(
    spark: SparkSession,
    state: JoinState,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    on: Sequence[str],
) -> None:
    """Maintain a materialized equi-join view under APPEND-ONLY deltas
    (the streaming-events case) with the classic delta-join rule:

        dV = dA >< B  UNION ALL  A >< dB  UNION ALL  dA >< dB

    so each batch costs two joins of a SMALL delta against an
    accumulated side plus the delta-delta join — never a recompute of
    A >< B.  Deltas are broadcast when Spark's threshold allows (they
    are the small side by construction).  Deletes/updates would need
    multiset counting (or a table format's MERGE); this maintains the
    insert-only contract and the tests assert exact multiset equality
    with a from-scratch join after every batch.

    All three state tables swap atomically (same crash contract as the
    aggregate path)."""
    a_exists = os.path.exists(state.a_path)
    b_exists = os.path.exists(state.b_path)
    a_old = _read_pq(spark, state.a_path) if a_exists else None
    b_old = _read_pq(spark, state.b_path) if b_exists else None

    parts = []
    if delta_a is not None and b_old is not None:
        parts.append(delta_a.join(b_old, list(on)))
    if a_old is not None and delta_b is not None:
        parts.append(a_old.join(delta_b, list(on)))
    if delta_a is not None and delta_b is not None:
        parts.append(delta_a.join(delta_b, list(on)))
    dv = None
    for p in parts:
        dv = p if dv is None else dv.unionByName(p)

    if dv is not None:
        if os.path.exists(state.view_path):
            dv = _read_pq(spark, state.view_path).unionByName(dv)
        _atomic_swap_write(dv, state.view_path)
    if delta_a is not None:
        na = a_old.unionByName(delta_a) if a_old is not None else delta_a
        _atomic_swap_write(na, state.a_path)
    if delta_b is not None:
        nb = b_old.unionByName(delta_b) if b_old is not None else delta_b
        _atomic_swap_write(nb, state.b_path)
