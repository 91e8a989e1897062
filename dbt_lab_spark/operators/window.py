"""Window functions — entirely beyond-reference (the reference has no
ranking/analytic functions or frame specs, SURVEY.md §2.5).  Provided as
the idiomatic Spark upgrades the new engine declares in its inventory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _spec(partition_by: Sequence[str], order_by: Sequence[str], ascending: Sequence[bool] | None) -> WindowSpec:
    if ascending is None:
        ascending = [True] * len(order_by)
    keys = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(order_by, ascending)]
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*keys)


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    ascending: Sequence[bool] | None = None,
    fn: str = "row_number",
    alias: str = "rank",
) -> DataFrame:
    """Attach a ranking column: row_number / rank / dense_rank."""
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    if fn not in fns:
        raise ValueError(f"unknown ranking fn {fn!r}; one of {sorted(fns)}")
    return df.withColumn(alias, fns[fn]().over(_spec(partition_by, order_by, ascending)))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    k: int,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number — the distributed idiom
    (one shuffle on the partition keys; no global sort)."""
    out = ranked(df, partition_by, order_by, ascending, "row_number", "__rn")
    return out.filter(F.col("__rn") <= k).drop("__rn")


def windowed_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    agg: Column,
    alias: str,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Generic analytic aggregate over a window (running sums, lag/lead
    composites are built by passing e.g. F.sum(...)/F.lag(...))."""
    return df.withColumn(alias, agg.over(_spec(partition_by, order_by, ascending)))


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    agg: Column,
    alias: str,
    preceding: int | None = None,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Frame-spec aggregate: cumulative (preceding=None ⇒ UNBOUNDED
    PRECEDING..CURRENT ROW) or moving (last `preceding`+1 rows).  The
    frame-spec surface the reference's grammar lacks entirely."""
    lo = Window.unboundedPreceding if preceding is None else -preceding
    spec = _spec(partition_by, order_by, ascending).rowsBetween(lo, Window.currentRow)
    return df.withColumn(alias, agg.over(spec))


def ntile_approx(
    df: DataFrame,
    value_col: str,
    k: int,
    out_col: str = "bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """Distribution bucketing WITHOUT a global sort — the 100 TB path
    for NTILE (exact NTILE needs a single total order, i.e. one
    executor sees every row; see q_ntile).  Computes k-1 approximate
    quantile cuts (percentile_approx — a mergeable KLL-style sketch,
    so the shuffle carries sketches, not rows), broadcasts the 1-row
    cut array, and assigns bucket = 1 + #cuts strictly below the
    value as an array fold.  Buckets are value-monotone and sized
    n/k ± the sketch error; ties land in one bucket (unlike exact
    NTILE, which splits ties to equalize counts).
    """
    fracs = [i / k for i in range(1, k)]
    cuts = df.agg(
        F.percentile_approx(value_col, F.array(*[F.lit(f) for f in fracs]), accuracy).alias(
            "__cuts"
        )
    )
    v = F.col(value_col)
    bucket = (
        F.lit(1)
        + F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(v > c, 1).otherwise(0),
        )
    ).cast("int")
    return df.crossJoin(F.broadcast(cuts)).withColumn(out_col, bucket).drop("__cuts")
