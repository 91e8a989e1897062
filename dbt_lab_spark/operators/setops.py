"""Set operations — entirely beyond-reference upgrades (the reference
grammar has no UNION/INTERSECT/EXCEPT tokens, parser/Token.java:20-42;
SURVEY.md §2.7).  Thin wrappers for inventory completeness; Spark
resolves by position, so `by_name` variants guard column-order bugs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame, by_name: bool = True) -> DataFrame:
    """UNION ALL (bag semantics)."""
    return left.unionByName(right) if by_name else left.union(right)


def union_distinct(left: DataFrame, right: DataFrame, by_name: bool = True) -> DataFrame:
    """UNION (set semantics)."""
    return union_all(left, right, by_name).distinct()


def intersect(left: DataFrame, right: DataFrame, all: bool = False) -> DataFrame:
    """INTERSECT [ALL]."""
    return left.intersectAll(right) if all else left.intersect(right)


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT (set semantics)."""
    return left.subtract(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT ALL (bag semantics)."""
    return left.exceptAll(right)
