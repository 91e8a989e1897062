"""r3 session-7 additions: experiment design (minimum detectable
effect / power planning), robust estimation (winsorized moments,
Tukey median polish), and a full gradient-boosting round (stump fit +
residual update + loss accounting).  Same (builder, oracle) contract
as dbt_lab_spark.workload.

Reference capability evidence: the reference's aggregate + join +
sort physical operators (qexec/PhysicalOperators*.java) and its
Hadoop bulk-operator extension point
(mapred/qexec/examples/CountTuplesOperator.java:36-67); each query
re-expresses one distributed shape a user of that surface would
build, Spark-first.

Determinism: integer/decimal arithmetic end-to-end where possible,
frozen constants as exact decimal literals, identical double-formula
parenthesization in both engines, deterministic tie-breaks on every
rank/argmin pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef

_D = "double"


# ---------------------------------------------------------------------------
# minimum detectable effect / power planning per event type
# ---------------------------------------------------------------------------

# frozen z-quantiles: z_{0.975} + z_{0.80} for 5% two-sided alpha, 80% power
_MDE_ZSUM = 2.801586
_MDE_REL_LIFT = 0.05  # plan for a +5% relative lift


def _q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning per event type: with success =
    value > 100, compute the observed rate p and volume n, the
    absolute minimum detectable effect at 80% power / 5% alpha for a
    50/50 split of the SAME volume (MDE = zsum * sqrt(2 p(1-p) /
    (n/2))), and the days of data needed to detect a +5% relative
    lift — the sizing arithmetic every A/B platform runs before
    launch.  Counts are exact integers from ONE aggregate; formulas
    are identically-parenthesized doubles with frozen z constants.
    Scale: one events hash aggregate to the 5-row type grain."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "event_type",
        (money("value") > 100).cast("long").alias("hit"),
        F.to_date("ts").alias("day"),
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hit").alias("k"),
        F.countDistinct("day").alias("n_days"),
    )
    nd = F.col("n").cast(_D)
    p = F.col("k").cast(_D) / nd
    mde_abs = F.lit(_MDE_ZSUM) * F.sqrt(2.0 * p * (1.0 - p) / (nd / 2.0))
    n_req = (
        2.0
        * F.lit(_MDE_ZSUM)
        * F.lit(_MDE_ZSUM)
        * p
        * (1.0 - p)
        / (F.lit(_MDE_REL_LIFT) * p * (F.lit(_MDE_REL_LIFT) * p))
    )
    per_day = nd / F.col("n_days").cast(_D)
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(p, 6).alias("rate"),
        F.round(mde_abs, 6).alias("mde_abs"),
        F.round(mde_abs / p, 6).alias("mde_rel"),
        F.round(n_req, 2).alias("n_required"),
        F.round(n_req / per_day, 2).alias("days_needed"),
    ).orderBy("event_type")


_SQL_MDE_POWER = f"""
WITH agg AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CASE WHEN CAST(value AS DECIMAL(18,2)) > 100 THEN 1 ELSE 0 END) AS k,
         COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
  FROM events GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       round({_MDE_ZSUM} * sqrt(2.0 * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                                / (CAST(n AS DOUBLE) / 2.0)), 6) AS mde_abs,
       round({_MDE_ZSUM} * sqrt(2.0 * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                                / (CAST(n AS DOUBLE) / 2.0))
             / (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS mde_rel,
       round(2.0 * {_MDE_ZSUM} * {_MDE_ZSUM}
             * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             / (({_MDE_REL_LIFT} * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)))
                * ({_MDE_REL_LIFT} * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)))), 2)
         AS n_required,
       round((2.0 * {_MDE_ZSUM} * {_MDE_ZSUM}
              * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              / (({_MDE_REL_LIFT} * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)))
                 * ({_MDE_REL_LIFT} * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)))))
             / (CAST(n AS DOUBLE) / CAST(n_days AS DOUBLE)), 2) AS days_needed
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# winsorized moments at exact discrete P5/P95 per event type
# ---------------------------------------------------------------------------


def _q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/std per event type: clamp values at the EXACT
    discrete P5/P95 order statistics (found on the compressed
    per-distinct-value cumulative frame, the q_qq_plot pattern), then
    take exact DECIMAL moments of the clamped values — the
    tail-robust complement to q_trimmed_mean (winsorizing keeps n,
    trimming shrinks it).  Clamped values stay canonical
    DECIMAL(18,2), so sums and squared sums are exact; only the final
    mean/std are doubles.  Scale: two hash aggregates over the
    compressed value domain + one re-aggregation."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("event_type", money("value").alias("v"))
    cum = (
        ev.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "event_type",
            "v",
            "cnt",
            F.sum("cnt")
            .over(
                Window.partitionBy("event_type")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cum"),
            F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
        )
    )

    def pick(q: int, alias: str) -> DataFrame:
        rank = F.expr(f"({q} * n + 99) div 100")
        return (
            cum.filter((rank > F.col("cum") - F.col("cnt")) & (rank <= F.col("cum")))
            .select("event_type", F.col("v").alias(alias))
        )

    cuts = pick(5, "p5").join(pick(95, "p95"), "event_type")
    clamped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "p5",
        "p95",
        F.least(F.greatest(F.col("v"), F.col("p5")), F.col("p95")).alias("w"),
        "v",
    )
    mom = clamped.groupBy("event_type", "p5", "p95").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum("w").alias("sw"),
        F.sum((F.col("w") * 100).cast("long") * (F.col("w") * 100).cast("long")).alias(
            "sww"
        ),
    )
    nd = F.col("n").cast(_D)
    wins_mean = F.col("sw").cast(_D) / nd
    wins_var = (
        nd * F.col("sww").cast(_D)
        - (F.col("sw").cast(_D) * 100.0) * (F.col("sw").cast(_D) * 100.0)
    ) / (nd * (nd - 1.0)) / 10000.0
    return mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("p5").cast(_D).alias("p5"),
        F.col("p95").cast(_D).alias("p95"),
        F.round(F.col("sv").cast(_D) / nd, 6).alias("raw_mean"),
        F.round(wins_mean, 6).alias("wins_mean"),
        F.round(F.sqrt(wins_var), 6).alias("wins_std"),
    ).orderBy("event_type")


_SQL_WINSORIZED_STATS = """
WITH ev AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
), cum AS MATERIALIZED (
  SELECT event_type, v, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM (SELECT event_type, v, COUNT(*) AS cnt FROM ev GROUP BY 1, 2)
), p5 AS (
  SELECT event_type, v AS p5 FROM cum
  WHERE (5 * n + 99) // 100 > cum - cnt AND (5 * n + 99) // 100 <= cum
), p95 AS (
  SELECT event_type, v AS p95 FROM cum
  WHERE (95 * n + 99) // 100 > cum - cnt AND (95 * n + 99) // 100 <= cum
), clamped AS (
  SELECT e.event_type, p5.p5, p95.p95, e.v,
         least(greatest(e.v, p5.p5), p95.p95) AS w
  FROM ev e JOIN p5 USING (event_type) JOIN p95 USING (event_type)
), mom AS (
  SELECT event_type, p5, p95, COUNT(*) AS n, SUM(v) AS sv, SUM(w) AS sw,
         SUM(CAST(w * 100 AS BIGINT) * CAST(w * 100 AS BIGINT)) AS sww
  FROM clamped GROUP BY 1, 2, 3
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(p5 AS DOUBLE) AS p5, CAST(p95 AS DOUBLE) AS p95,
       round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_mean,
       round(CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), 6) AS wins_mean,
       round(sqrt((CAST(n AS DOUBLE) * CAST(sww AS DOUBLE)
                   - (CAST(sw AS DOUBLE) * 100.0) * (CAST(sw AS DOUBLE) * 100.0))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0), 6)
         AS wins_std
FROM mom
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# one full gradient-boosting round (stump + shrinkage + loss audit)
# ---------------------------------------------------------------------------

_GBM_BIN_CENTS = 50000
_GBM_LR = "0.5"  # shrinkage, exact decimal literal


def _q_gbm_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full gradient-boosting round for squared loss on order
    totalprice vs customer acctbal: start from the constant model
    (frozen round-6 mean), find the best histogram split (the
    q_split_gain machinery), fit the two leaf values as frozen round-6
    mean residuals scaled by shrinkage 0.5, and report train SSE
    before vs after — the complete model-update step q_split_gain
    only scores.  Freezing the base prediction and leaf values to
    DECIMAL makes every residual an exact decimal, so both SSE sums
    are exact and the improvement ratio is one double division.
    Scale: two passes (moment aggregate, then per-bin residual
    aggregate + final SSE reduce), each map-side combined."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.floor(
            (money("c_acctbal") * 100).cast("long") / F.lit(float(_GBM_BIN_CENTS))
        )
        .cast("long")
        .alias("bin"),
        money("o_totalprice").alias("y"),
    )
    mean0 = base.agg(
        F.round(F.sum("y").cast(_D) / F.count(F.lit(1)).cast(_D), 6)
        .cast("decimal(18,6)")
        .alias("f0"),
        F.count(F.lit(1)).alias("n"),
    )
    resid = base.crossJoin(F.broadcast(mean0)).select(
        "bin", "y", (F.col("y") - F.col("f0")).alias("g"), "f0", "n"
    )
    per_bin = resid.groupBy("bin").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("g").alias("sg"),
        F.max("f0").alias("f0"),
        F.max("n").alias("n"),
    )
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_bin.select(
        "bin",
        "f0",
        "n",
        F.sum("c").over(wb).alias("cl"),
        F.sum("sg").over(wb).alias("gl"),
        F.sum("c").over(Window.partitionBy()).alias("ctot"),
        F.sum("sg").over(Window.partitionBy()).alias("gtot"),
        F.max("bin").over(Window.partitionBy()).alias("maxbin"),
    )
    gld = F.col("gl").cast(_D)
    grd = (F.col("gtot") - F.col("gl")).cast(_D)
    gain = gld * gld / (F.col("cl").cast(_D) + 1.0) + grd * grd / (
        (F.col("ctot") - F.col("cl")).cast(_D) + 1.0
    )
    best = (
        cum.filter(F.col("bin") < F.col("maxbin"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc(gain), "bin")))
        .filter(F.col("rn") == 1)
        .select(
            F.col("bin").alias("split_bin"),
            "cl",
            "gl",
            "ctot",
            "gtot",
            # frozen round-6 leaf deltas with shrinkage
            (
                F.round(F.col("gl").cast(_D) / F.col("cl").cast(_D), 6).cast(
                    "decimal(18,6)"
                )
                * F.lit(_GBM_LR).cast("decimal(3,1)")
            ).alias("leaf_l"),
            (
                F.round(
                    (F.col("gtot") - F.col("gl")).cast(_D)
                    / (F.col("ctot") - F.col("cl")).cast(_D),
                    6,
                ).cast("decimal(18,6)")
                * F.lit(_GBM_LR).cast("decimal(3,1)")
            ).alias("leaf_r"),
        )
    )
    scored = resid.crossJoin(F.broadcast(best.select("split_bin", "leaf_l", "leaf_r")))
    upd = scored.select(
        "g",
        (
            F.col("g")
            - F.when(F.col("bin") <= F.col("split_bin"), F.col("leaf_l")).otherwise(
                F.col("leaf_r")
            )
        ).alias("g1"),
    )
    # SSE in exact integer micro-units (g has scale 6 after the decimal
    # subtraction; g1 scale 7 from the 0.5 shrinkage product)
    sse = upd.select(
        (F.col("g") * 1000000).cast("decimal(38,0)").alias("gm"),
        (F.col("g1") * 10000000).cast("decimal(38,0)").alias("g1m"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gm") * F.col("gm")).alias("s0"),
        F.sum(F.col("g1m") * F.col("g1m")).alias("s1"),
    )
    nd = F.col("n").cast(_D)
    sse0 = F.col("s0").cast(_D) / 1e12 / nd
    sse1 = F.col("s1").cast(_D) / 1e14 / nd
    return sse.crossJoin(F.broadcast(best)).select(
        F.col("split_bin").cast("bigint").alias("split_bin"),
        F.col("cl").cast("bigint").alias("n_left"),
        (F.col("ctot") - F.col("cl")).cast("bigint").alias("n_right"),
        F.col("leaf_l").cast(_D).alias("leaf_left"),
        F.col("leaf_r").cast(_D).alias("leaf_right"),
        F.round(sse0, 4).alias("mse_before"),
        F.round(sse1, 4).alias("mse_after"),
        F.round((sse0 - sse1) / sse0, 6).alias("improvement"),
    )


_SQL_GBM_ROUND = f"""
WITH base AS MATERIALIZED (
  SELECT CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    / {float(_GBM_BIN_CENTS)}) AS BIGINT) AS bin,
         CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
), mean0 AS (
  SELECT CAST(round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS f0,
         COUNT(*) AS n
  FROM base
), resid AS MATERIALIZED (
  SELECT b.bin, b.y, b.y - m.f0 AS g, m.f0, m.n
  FROM base b CROSS JOIN mean0 m
), per_bin AS (
  SELECT bin, COUNT(*) AS c, SUM(g) AS sg, MAX(f0) AS f0, MAX(n) AS n
  FROM resid GROUP BY 1
), cum AS (
  SELECT bin, f0, n,
         SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cl,
         SUM(sg) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS gl,
         SUM(c) OVER () AS ctot,
         SUM(sg) OVER () AS gtot,
         MAX(bin) OVER () AS maxbin
  FROM per_bin
), best AS MATERIALIZED (
  SELECT bin AS split_bin, f0, n, cl, gl, ctot, gtot,
         CAST(round(CAST(gl AS DOUBLE) / CAST(cl AS DOUBLE), 6)
              AS DECIMAL(18,6)) * CAST({_GBM_LR} AS DECIMAL(3,1)) AS leaf_l,
         CAST(round(CAST(gtot - gl AS DOUBLE) / CAST(ctot - cl AS DOUBLE), 6)
              AS DECIMAL(18,6)) * CAST({_GBM_LR} AS DECIMAL(3,1)) AS leaf_r
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      ORDER BY CAST(gl AS DOUBLE) * CAST(gl AS DOUBLE) / (CAST(cl AS DOUBLE) + 1.0)
               + CAST(gtot - gl AS DOUBLE) * CAST(gtot - gl AS DOUBLE)
                 / (CAST(ctot - cl AS DOUBLE) + 1.0) DESC, bin) AS rn
    FROM cum WHERE bin < maxbin
  ) WHERE rn = 1
), upd AS (
  SELECT r.g,
         r.g - CASE WHEN r.bin <= b.split_bin THEN b.leaf_l ELSE b.leaf_r END AS g1
  FROM resid r CROSS JOIN best b
), sse AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(CAST(g AS DECIMAL(38,6)) * 1000000 AS HUGEINT)
             * CAST(CAST(g AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) AS s0,
         SUM(CAST(CAST(g1 AS DECIMAL(38,7)) * 10000000 AS HUGEINT)
             * CAST(CAST(g1 AS DECIMAL(38,7)) * 10000000 AS HUGEINT)) AS s1
  FROM upd
)
SELECT CAST(b.split_bin AS BIGINT) AS split_bin,
       CAST(b.cl AS BIGINT) AS n_left,
       CAST(b.ctot - b.cl AS BIGINT) AS n_right,
       CAST(b.leaf_l AS DOUBLE) AS leaf_left,
       CAST(b.leaf_r AS DOUBLE) AS leaf_right,
       round(CAST(s.s0 AS DOUBLE) / 1e12 / CAST(s.n AS DOUBLE), 4) AS mse_before,
       round(CAST(s.s1 AS DOUBLE) / 1e14 / CAST(s.n AS DOUBLE), 4) AS mse_after,
       round((CAST(s.s0 AS DOUBLE) / 1e12 / CAST(s.n AS DOUBLE)
              - CAST(s.s1 AS DOUBLE) / 1e14 / CAST(s.n AS DOUBLE))
             / (CAST(s.s0 AS DOUBLE) / 1e12 / CAST(s.n AS DOUBLE)), 6)
         AS improvement
FROM sse s CROSS JOIN best b
"""


SESSION7_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_mde_power", _q_mde_power, _SQL_MDE_POWER,
        "MDE / power planning per event type",
    ),
    QueryDef(
        "q_winsorized_stats", _q_winsorized_stats, _SQL_WINSORIZED_STATS,
        "winsorized moments at exact discrete P5/P95",
    ),
    QueryDef(
        "q_gbm_round", _q_gbm_round, _SQL_GBM_ROUND,
        "one full GBDT round: stump + shrinkage + loss audit",
    ),
]
