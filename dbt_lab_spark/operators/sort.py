"""Sort / limit / top-k.

Reference: external merge-sort operator (qexec/SortOperator.java:12,
heap qexec/heap/QueryHeap.java:47-68 — in-memory with graceful spill to
runs + multiway merge), multi-column with per-column asc/desc
(createSortOperator, OperatorFactory.java:335-345).  The reference has
NO LIMIT (parser/Token.java:20-42) — limit/top-k are free upgrades.

Spark mapping: `df.orderBy(...)` — range-partitioned sample-based
global sort; Tungsten's UnsafeExternalSorter spills natively, replacing
QueryHeap.  `df.limit(n)` after orderBy is planned as TakeOrderedAndProject
(a distributed top-k: per-partition heaps + driver merge, no global sort)
— exactly the plan you want at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort(
    df: DataFrame,
    columns: Sequence[str],
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Multi-column sort with per-column direction, mirroring
    createSortOperator(child, ..., int[] sortColumns, boolean[] columnsAscending)
    (OperatorFactory.java:335-345)."""
    if ascending is None:
        ascending = [True] * len(columns)
    if len(ascending) != len(columns):
        raise ValueError("columns and ascending must have equal length")
    keys: list[Column] = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in zip(columns, ascending)
    ]
    return df.orderBy(*keys)


def limit(df: DataFrame, n: int) -> DataFrame:
    """LIMIT n (upgrade — absent from the reference grammar)."""
    return df.limit(n)


def top_k(
    df: DataFrame,
    columns: Sequence[str],
    k: int,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Top-k by sort key: orderBy + limit fuses to TakeOrderedAndProject,
    avoiding a full global sort."""
    return sort(df, columns, ascending).limit(k)
