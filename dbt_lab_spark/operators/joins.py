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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_ms: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for every left row, attach the single right row with
    the greatest `right_ts` <= `left_ts` (backward, inclusive) or the
    smallest `right_ts` >= `left_ts` (forward) for the same key.

    The reference has no such operator (SURVEY.md §2.3: equi/θ joins
    only); this is the time-series capability upgrade.  Spark-first
    plan: instead of a range join (which Catalyst would execute as a
    per-key BNLJ), union the two sides with a tag and carry the most
    recent right values forward with `last(ignorenulls)` over a
    (key, ts, tag) window — ONE shuffle on the key, linear in
    |left|+|right|, no candidate explosion.  At 100 TB both sides
    shuffle-partition by key and each partition is a single ordered
    sweep (Tungsten sort + spill), which is the same plan a dedicated
    as-of operator would pick.

    Right columns other than key/ts are carried; names clashing with
    left columns get `suffix`.  The matched right timestamp is exposed
    as `f"{right_ts}{suffix}"` if `right_ts` clashes, else as-is.
    Ties on (key, ts): right rows at exactly left_ts DO match
    (inclusive, same as DuckDB/pandas ASOF); among several right rows
    with identical (key, ts) the carried one is the last in an
    engine-internal order — pre-aggregate the right side to unique
    (key, ts) for full determinism.
    `tolerance_ms` nulls the carried columns when the time gap
    exceeds it (pandas merge_asof tolerance semantics).
    """
    from pyspark.sql.window import Window

    keys = [key] if isinstance(key, str) else list(key)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    carry_src = [c for c in right.columns if c not in keys and c != right_ts]
    renames = {c: (c + suffix if c in left.columns else c) for c in carry_src}
    matched_ts = right_ts + suffix if right_ts in left.columns else right_ts

    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(renames[c]) for c in carry_src],
    )
    l2 = left.withColumn("__ts", F.col(left_ts)).withColumn("__tag", F.lit(1))
    both = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col("__ts").asc(), F.col("__tag").asc()]
    if direction == "forward":
        order = [F.col("__ts").desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = [renames[c] for c in carry_src]
    out = both.withColumn("__m_ts", F.last(F.when(F.col("__tag") == 0, F.col("__ts")), True).over(w))
    for c in carried:
        out = out.withColumn(c, F.last(F.when(F.col("__tag") == 0, F.col(c)), True).over(w))
    out = out.filter(F.col("__tag") == 1)

    if tolerance_ms is not None:
        gap = F.abs(F.unix_millis(F.col("__ts")) - F.unix_millis(F.col("__m_ts")))
        keep = F.col("__m_ts").isNotNull() & (gap <= tolerance_ms)
        for c in carried:
            out = out.withColumn(c, F.when(keep, F.col(c)))
        out = out.withColumn("__m_ts", F.when(keep, F.col("__m_ts")))

    return out.withColumn(matched_ts, F.col("__m_ts")).drop("__ts", "__tag", "__m_ts")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    suffix: str = "_r",
) -> DataFrame:
    """Banded interval join: pairs (l, r) with the same key and
    `l.left_ts + lower_ms <= r.right_ts <= l.left_ts + upper_ms`.

    Naively this is a non-equi join → BroadcastNestedLoopJoin, which is
    quadratic per key and dies at scale.  The scale-safe plan buckets
    time into bins of width (upper_ms - lower_ms): a right row can then
    only fall in bin(l+lower) or bin(l+lower)+1, so exploding the left
    side to those two candidate bins turns the band into an EQUI-join
    on (key, bin) followed by an exact range filter — shuffle-hash /
    sort-merge, 2× left fan-out, no cartesian anywhere.  Each matching
    pair appears exactly once (the two candidate bins are distinct).
    """
    if upper_ms <= lower_ms:
        raise ValueError("upper_ms must be > lower_ms")
    keys = [key] if isinstance(key, str) else list(key)
    width = upper_ms - lower_ms

    renames = {c: (c + suffix if c in left.columns else c) for c in right.columns if c not in keys}
    r2 = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(renames[c]) for c in right.columns if c not in keys],
    )
    rts = renames.get(right_ts, right_ts)

    # exact integer division (epoch millis are positive, so div == floor);
    # double division would risk off-by-one at exact bin boundaries
    lo_bin = (F.unix_millis(F.col(left_ts)) + F.lit(lower_ms)) - (
        (F.unix_millis(F.col(left_ts)) + F.lit(lower_ms)) % F.lit(width)
    )
    lo_bin = (lo_bin / F.lit(width)).cast("long")
    l2 = left.withColumn("__bin", F.explode(F.array(lo_bin, lo_bin + 1)))
    r_bin = (
        (F.unix_millis(F.col(rts)) - F.unix_millis(F.col(rts)) % F.lit(width)) / F.lit(width)
    ).cast("long")
    r3 = r2.withColumn("__bin", r_bin)

    joined = l2.join(r3, on=[*keys, "__bin"], how="inner")
    delta = F.unix_millis(F.col(rts)) - F.unix_millis(F.col(left_ts))
    return joined.filter((delta >= lower_ms) & (delta <= upper_ms)).drop("__bin")


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

    Only ``inner``/``left`` are supported: with right/full outer joins,
    unmatched small-side rows would surface once per salt bucket.  The
    salt is derived from the large side's row content (xxhash64), not
    rand() — deterministic under task retry, so recomputed partitions
    produce identical results.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "outer small-side rows would duplicate across salt buckets"
        )
    salted_large = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_buckets)).cast("int"),
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_large.join(salted_small, on=[key, "__salt"], how=how)
    return out.drop("__salt")
