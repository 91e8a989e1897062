"""Predicate and expression builders — the reference's analyzer IR
re-expressed as Catalyst Column expressions.

Covers the reference's predicate forms (SURVEY.md §2.2):
  - LowLevelPredicate: <column> op <literal>, ops = <> < <= > >=
    (qexec/LowLevelPredicate.java:21,49-79)
  - conjunction / disjunction combinators
    (qexec/predicate/LocalPredicateConjunction.java:18, ...Disjunction.java:18)
  - BETWEEN, incl. one-sided ranges (semantics/predicate/
    LocalPredicateBetween.java:18,55; OperatorFactory.java:104-106 maps
    one-sided ranges to type min/max — here simply an open comparison)
  - column-column join predicates (parser/Predicate.java:27-52)
  - arithmetic expressions + - * / (parser/Expression.java:13-34);
    constant folding is Catalyst's job.

NULL semantics: the reference makes NULL fail every predicate
(LowLevelPredicate.java:102-132); Spark's ternary logic agrees for all
six operators, so no shim is needed.
"""

from __future__ import annotations

import operator
from collections.abc import Callable, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# The six comparison operators of the reference grammar
# (parser/Predicate.java:58-93).  No LIKE/IN/IS NULL in the reference —
# we expose them anyway as free Spark upgrades (SURVEY.md §2.2 absences).
_OPS: dict[str, Callable[[Column, object], Column]] = {
    "=": operator.eq,
    "<>": operator.ne,
    "!=": operator.ne,
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
}


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def compare(column: str | Column, op: str, literal: object) -> Column:
    """LowLevelPredicate: column <op> literal."""
    if op not in _OPS:
        raise ValueError(f"unknown operator {op!r}; one of {sorted(_OPS)}")
    return _OPS[op](_col(column), literal)


def column_compare(left: str | Column, op: str, right: str | Column) -> Column:
    """COLUMN_COLUMN predicate (join predicate form)."""
    if op not in _OPS:
        raise ValueError(f"unknown operator {op!r}")
    return _OPS[op](_col(left), _col(right))


def conjunction(preds: Iterable[Column]) -> Column:
    """AND of predicates (LocalPredicateConjunction)."""
    preds = list(preds)
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def disjunction(preds: Iterable[Column]) -> Column:
    """OR of predicates (LocalPredicateDisjunction)."""
    preds = list(preds)
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def between(
    column: str | Column,
    lower: object = None,
    upper: object = None,
    lower_inclusive: bool = True,
    upper_inclusive: bool = True,
) -> Column:
    """Range predicate with optional one-sided bounds.

    The reference synthesizes BETWEEN from range pairs and fills open
    sides with type min/max (OperatorFactory.java:104-106); in Catalyst an
    open side is simply omitted.
    """
    c = _col(column)
    parts: list[Column] = []
    if lower is not None:
        parts.append(c >= lower if lower_inclusive else c > lower)
    if upper is not None:
        parts.append(c <= upper if upper_inclusive else c < upper)
    if not parts:
        raise ValueError("between() needs at least one bound")
    return conjunction(parts)


def arithmetic(left: str | Column | object, op: str, right: str | Column | object) -> Column:
    """+ - * / over columns/literals (parser/Expression.java:13-34)."""
    ops = {"+": operator.add, "-": operator.sub, "*": operator.mul, "/": operator.truediv}
    if op not in ops:
        raise ValueError(f"unknown arithmetic op {op!r}")
    lhs = _col(left) if isinstance(left, (str, Column)) else F.lit(left)
    rhs = _col(right) if isinstance(right, (str, Column)) else F.lit(right)
    return ops[op](lhs, rhs)


def money(column: str | Column, scale: int = 2) -> Column:
    """Cast a money-like double to an exact decimal for aggregation.

    Summing doubles is order-dependent, so distributed SUM results are
    not bit-reproducible across engines/partitionings.  Casting to
    decimal before aggregating makes SUM/AVG exact and deterministic —
    the engine-side half of the oracle canonicalization strategy
    (SURVEY.md §7 risk register, 'FLOAT aggregates').
    """
    return _col(column).cast(f"decimal(18,{scale})")
