"""Join operators.

Reference inventory (SURVEY.md §2.3): NestedLoopJoin (theta-capable,
qexec/NestedLoopJoinOperator.java:17), Index-Nested-Loop (optimizer-
assembled, PhysicalPlanGeneratorUtils.java:432), MergeJoin (inner
equi-join on sorted inputs, OperatorFactory.java:305-315), Cartesian
(NLJ with null predicate, OperatorFactory.java:223-225).

Spark mapping: all collapse to `df.join(...)` — Catalyst/AQE pick
broadcast-hash / shuffled-hash / sort-merge / BNLJ.  We add what the
reference lacked as free upgrades: outer/semi/anti joins, explicit
broadcast, and a salted join for skewed keys (the 100 TB posture).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join (reference MergeJoin / index-NLJ semantics, plus
    outer/semi/anti upgrades). Multi-column keys supported, matching
    createMergeJoinOperator's int[] join columns
    (OperatorFactory.java:305-315)."""
    return left.join(right, on=on, how=how)


def theta_join(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """NestedLoopJoin with an arbitrary theta predicate
    (any Predicate.Operator — OperatorFactory.java:260-270).  Spark plans
    BroadcastNestedLoopJoin when no equi-conjunct exists."""
    return left.join(right, on=condition, how="inner")


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product — NLJ with null predicate
    (OperatorFactory.java:223-225)."""
    return left.crossJoin(right)


def broadcast_join(
    large: DataFrame, small: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with the small side broadcast — replaces the reference's
    Index-Nested-Loop pattern (correlated B-tree lookups per outer tuple)
    with a shuffle-free hash join.  Use for dimension tables at any scale."""
    return large.join(F.broadcast(small), on=on, how=how)


def merge_join_hint(
    left: DataFrame, right: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Force sort-merge join (the reference's MergeJoin).  Normally let
    AQE decide; this exists for plan-shape tests and for large-large
    joins where SMJ's bounded memory is preferred."""
    return left.hint("merge").join(right, on=on, how=how)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side's key, explode the
    small side across the salt domain, join on (key, salt).

    At 100 TB a single hot key (e.g. a null-ish default or a celebrity
    user_id) makes one reducer the straggler; AQE's skew-join splitting
    handles sort-merge cases, but salting is the deterministic fix when
    the small side fits a replication factor.  Columns returned match a
    plain join (salt dropped).
    """
    salted_large = large.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_large.join(salted_small, on=[key, "__salt"], how=how)
    return out.drop("__salt")
