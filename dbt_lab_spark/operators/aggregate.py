"""Aggregation operators.

Reference: GroupByOperator (qexec/GroupByOperator.java:12; factory
createGroupByOperator, OperatorFactory.java:393-406) — sort-based
grouping with COUNT/SUM/AVG/MIN/MAX (agg enum parser/OutputColumn.java:21-51),
SUM/AVG restricted to arithmetic types (OperatorFactory.java:357-361),
the same input column aggregable N ways, and grand-total aggregation with
empty group columns.  HAVING is a post-aggregation filter
(parser/HavingClause.java).  The Hadoop GroupBy (map→combine→reduce,
HadoopOperator.java:96-146) is the same spec distributed.

Spark mapping: `df.groupBy(...).agg(...)` — hash aggregation with
partial (map-side combine) + final phases, which *is* the reference's
combiner pattern; sort-based grouping was an implementation detail we do
not copy.  Free upgrades: DISTINCT aggregates, rollup/cube/grouping sets.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_lab_spark.types import is_arithmetic

_AGG_FNS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class AggSpec:
    """One aggregate: function name, input column, output alias.

    Mirrors one position of the reference's parallel arrays
    (aggColumnIndices / aggregateFunctions / aggColumnTypes,
    OperatorFactory.java:393-406).  `distinct=True` is a Spark upgrade.
    """

    fn: str
    column: str | Column
    alias: str
    distinct: bool = False

    def to_column(self) -> Column:
        fn = self.fn.lower()
        if fn not in _AGG_FNS:
            raise ValueError(f"unknown aggregate {self.fn!r}; one of {sorted(_AGG_FNS)}")
        if self.distinct:
            if not isinstance(self.column, str):
                raise ValueError("DISTINCT aggregates require a named column")
            return F.expr(f"{fn}(DISTINCT {self.column})").alias(self.alias)
        col = F.col(self.column) if isinstance(self.column, str) else self.column
        return _AGG_FNS[fn](col).alias(self.alias)


def _check_arithmetic(df: DataFrame, specs: Sequence[AggSpec]) -> None:
    """Enforce the reference rule: SUM/AVG only on arithmetic types
    (OperatorFactory.java:357-361); COUNT/MIN/MAX on any type."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for s in specs:
        if s.fn.lower() in ("sum", "avg") and isinstance(s.column, str):
            dt = dtypes.get(s.column)
            if dt is not None and not is_arithmetic(dt):
                raise TypeError(
                    f"{s.fn.upper()} on non-arithmetic column {s.column!r} ({dt}) "
                    "— reference restricts SUM/AVG to arithmetic types"
                )


def group_by(
    df: DataFrame,
    group_columns: Sequence[str | Column],
    aggs: Sequence[AggSpec],
    having: Column | None = None,
) -> DataFrame:
    """GroupBy + optional HAVING.

    Empty `group_columns` = grand-total aggregation (the reference's
    empty-group-spec case); note Spark then returns a single row even on
    empty input, matching the reference's testAggregateCustomersEmpty
    semantics (TestPhysicalOperatorsIIIStudents.java:361).
    """
    _check_arithmetic(df, aggs)
    agg_cols = [s.to_column() for s in aggs]
    out = df.groupBy(*group_columns).agg(*agg_cols) if group_columns else df.agg(*agg_cols)
    if having is not None:
        out = out.filter(having)
    return out


def grand_aggregate(df: DataFrame, aggs: Sequence[AggSpec]) -> DataFrame:
    """Grand-total aggregation (empty group columns)."""
    return group_by(df, [], aggs)


def _grouping_flag_columns(group_columns: Sequence[str]) -> list[Column]:
    """GROUPING() indicator per group column (0 = grouped, 1 = rolled up).
    Disambiguates a rolled-up NULL from a data NULL, so multi-set results
    stay representation-robust across engines."""
    return [F.grouping(c).cast("int").alias(f"g_{c}") for c in group_columns]


def rollup(
    df: DataFrame,
    group_columns: Sequence[str],
    aggs: Sequence[AggSpec],
    grouping_flags: bool = False,
) -> DataFrame:
    """ROLLUP — beyond-reference upgrade (reference has no grouping sets,
    SURVEY.md §2.4 absences).  `grouping_flags=True` appends one
    GROUPING() indicator column per group column."""
    _check_arithmetic(df, aggs)
    flags = _grouping_flag_columns(group_columns) if grouping_flags else []
    return df.rollup(*group_columns).agg(*flags, *[s.to_column() for s in aggs])


def cube(
    df: DataFrame,
    group_columns: Sequence[str],
    aggs: Sequence[AggSpec],
    grouping_flags: bool = False,
) -> DataFrame:
    """CUBE — beyond-reference upgrade."""
    _check_arithmetic(df, aggs)
    flags = _grouping_flag_columns(group_columns) if grouping_flags else []
    return df.cube(*group_columns).agg(*flags, *[s.to_column() for s in aggs])


def pivot(
    df: DataFrame,
    group_columns: Sequence[str],
    pivot_column: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """PIVOT — beyond-reference upgrade (no grouping sets or pivots in
    the reference, SURVEY.md §2.4).  `pivot_values` is REQUIRED: an
    explicit value list keeps the output schema static so Catalyst
    skips the extra distinct-values job a dynamic pivot needs — at
    100 TB that job is a full shuffle you don't want for a fixed
    reporting dimension."""
    return df.groupBy(*group_columns).pivot(pivot_column, list(pivot_values)).agg(agg)


def unpivot(
    df: DataFrame,
    id_columns: Sequence[str],
    value_columns: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """UNPIVOT / melt — wide→long via the native unpivot (no UDF, no
    shuffle: a narrow 1→N row expansion).  Value columns must share a
    common type; cast beforehand."""
    return df.unpivot(
        [F.col(c) for c in id_columns],
        [F.col(c) for c in value_columns],
        var_name,
        value_name,
    )
