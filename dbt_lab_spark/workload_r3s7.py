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

from dbt_lab_spark.localrel import local_df

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


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (unrolled truncated absorption)
# ---------------------------------------------------------------------------

_MA_STEPS = 6
_MA_CHANNELS = ("click", "view", "signup", "error")


def _q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov attribution with removal effects: build the
    user-journey transition matrix (start -> channels -> conv on first
    purchase / null at journey end), then for each channel compute the
    conversion probability of the chain WITH THAT CHANNEL REMOVED
    (its outgoing AND incoming mass routed to null) and attribute by
    normalized removal effect — the data-driven alternative to
    last-touch that marketing stacks run.  Absorption probabilities
    use a 6-step truncated iteration v_{k+1}(s) = sum_t P(s,t) v_k(t)
    with P frozen round-6 DECIMAL and v re-frozen to round-6 after
    every step, so both engines walk identical numbers.

    Architecture (the llm/similarity.py Lloyd-loop precedent): Spark
    does the DISTRIBUTED work — one lag window + one hash aggregate
    from raw events down to the <=49-row transition matrix — and the
    O(states^2) absorption solve runs driver-side in exact
    decimal.Decimal arithmetic that replicates the engines' round
    semantics bit-for-bit (HALF_UP on the shortest-repr double, the
    same thing F.round and DuckDB round() do to the exact decimal
    sums).  An earlier all-DataFrame unroll was correct but spent ~30s
    of tiny-stage scheduling overhead on 49 rows; the matrix is
    O(|event types|^2) at ANY corpus size, so the driver pull is
    scale-safe.  Normalization sums ROUND-6 DECIMAL removal effects
    (order-free), never raw doubles."""
    from decimal import ROUND_HALF_UP, Decimal

    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "state")
    seq = ev.select(
        "user_id",
        "state",
        F.row_number().over(wu).alias("rn"),
        F.min(F.when(F.col("state") == "conv", F.col("ts"))).over(
            Window.partitionBy("user_id")
        ).alias("conv_ts"),
        "ts",
    ).filter(F.col("conv_ts").isNull() | (F.col("ts") <= F.col("conv_ts")))
    wj = Window.partitionBy("user_id").orderBy("rn")
    steps = seq.select(
        "user_id",
        F.coalesce(F.lag("state").over(wj), F.lit("start")).alias("s"),
        F.col("state").alias("t"),
        "rn",
        F.max("rn").over(Window.partitionBy("user_id")).alias("last_rn"),
    )
    tails = (
        steps.filter((F.col("rn") == F.col("last_rn")) & (F.col("t") != "conv"))
        .select(F.col("t").alias("s"), F.lit("null").alias("t"))
    )
    trans = (
        steps.select("s", "t")
        .unionAll(tails)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = trans.collect()  # <= (|types|+2)^2 rows — bounded driver pull

    six = Decimal("0.000001")

    def round6(x: float) -> Decimal:
        # F.round / DuckDB round(): HALF_UP on the shortest-repr double
        return Decimal(repr(float(x))).quantize(six, rounding=ROUND_HALF_UP)

    tot: dict[str, int] = {}
    for r in rows:
        tot[r["s"]] = tot.get(r["s"], 0) + r["cnt"]
    # p frozen exactly like the engines: double division, then round-6
    p = {(r["s"], r["t"]): round6(r["cnt"] / tot[r["s"]]) for r in rows}
    states = {s for s, _ in p} | {t for _, t in p}

    def absorb(removed: str | None) -> float:
        v = {s: Decimal(1) if s == "conv" else Decimal(0) for s in states}
        for _ in range(_MA_STEPS):
            nxt = {}
            for s in states:
                if s == "conv":
                    nxt[s] = Decimal(1)
                    continue
                if s == removed:
                    nxt[s] = Decimal(0)
                    continue
                acc = Decimal(0)  # exact scale-12 sum, like SUM(p*v)
                for (a, b), pv in p.items():
                    if a == s and b != removed:
                        acc += pv * v[b]
                nxt[s] = round6(float(acc))  # CAST AS DOUBLE -> round 6
            v = nxt
        return float(v.get("start", Decimal(0)))

    base = absorb(None)
    if base == 0.0:
        raise ValueError(
            "markov attribution needs at least one converting journey "
            "(empty corpus or no purchases)"
        )
    pconv = {c: absorb(c) for c in _MA_CHANNELS}
    re6 = {c: round6((base - pconv[c]) / base) for c in _MA_CHANNELS}
    re_tot = sum(re6.values())  # exact decimal sum of round-6 effects
    if re_tot == 0:
        # Conversions exist but never pass through any tracked channel:
        # every removal effect is 0 and attribution shares are undefined.
        # Same explicit refusal contract as the base == 0 case above
        # (registered in tests/test_empty_inputs.py semantics).
        raise ValueError(
            "markov attribution: no tracked channel has a nonzero removal "
            "effect (conversions bypass all tracked channels)"
        )
    out = [
        (
            c,
            float(round6(base)),
            float(round6(pconv[c])),
            float(re6[c]),
            float(round6(float(re6[c]) / float(re_tot))),
        )
        for c in _MA_CHANNELS
    ]
    out.sort()
    return local_df(spark, 
        out,
        "channel string, base_pconv double, removed_pconv double, "
        "removal_effect double, attribution double",
    )



def _sql_markov_attribution() -> str:
    chans = ", ".join(f"('{c}')" for c in ("none",) + _MA_CHANNELS)
    parts = [
        f"""WITH ev AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS state
  FROM events
), seq AS (
  SELECT * FROM (
    SELECT user_id, state, ts,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, state) AS rn,
           MIN(CASE WHEN state = 'conv' THEN ts END)
             OVER (PARTITION BY user_id) AS conv_ts
    FROM ev
  ) WHERE conv_ts IS NULL OR ts <= conv_ts
), steps AS MATERIALIZED (
  SELECT user_id,
         COALESCE(lag(state) OVER (PARTITION BY user_id ORDER BY rn), 'start') AS s,
         state AS t, rn,
         MAX(rn) OVER (PARTITION BY user_id) AS last_rn
  FROM seq
), trans AS MATERIALIZED (
  SELECT s, t, COUNT(*) AS cnt FROM (
    SELECT s, t FROM steps
    UNION ALL
    SELECT t AS s, 'null' AS t FROM steps WHERE rn = last_rn AND t <> 'conv'
  ) GROUP BY 1, 2
), probs AS MATERIALIZED (
  SELECT s, t,
         CAST(round(CAST(cnt AS DOUBLE)
                    / CAST(SUM(cnt) OVER (PARTITION BY s) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS p
  FROM trans
), removed AS (SELECT * FROM (VALUES {chans}) AS r(removed)),
pr AS MATERIALIZED (
  SELECT removed, s, t, p FROM removed CROSS JOIN probs
  WHERE s <> removed AND t <> removed
), states AS MATERIALIZED (
  SELECT DISTINCT removed, state FROM removed CROSS JOIN (
    SELECT t AS state FROM probs UNION SELECT s FROM probs)
),
v0 AS MATERIALIZED (
  SELECT removed, state,
         CASE WHEN state = 'conv' THEN CAST(1.000000 AS DECIMAL(18,6))
              ELSE CAST(0.000000 AS DECIMAL(18,6)) END AS v
  FROM states
)"""
    ]
    for k in range(1, _MA_STEPS + 1):
        parts.append(
            f""",
v{k} AS MATERIALIZED (
  SELECT st.removed, st.state,
         CASE WHEN st.state = 'conv' THEN CAST(1.000000 AS DECIMAL(18,6))
              ELSE COALESCE(sv.v, CAST(0.000000 AS DECIMAL(18,6))) END AS v
  FROM states st
  LEFT JOIN (
    SELECT pr.removed, pr.s AS state,
           CAST(round(CAST(SUM(pr.p * pv.v) AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
    FROM pr JOIN v{k - 1} pv ON pv.removed = pr.removed AND pv.state = pr.t
    GROUP BY 1, 2
  ) sv ON sv.removed = st.removed AND sv.state = st.state
)"""
        )
    parts.append(
        f""",
at_start AS (
  SELECT removed, CAST(v AS DOUBLE) AS pconv
  FROM v{_MA_STEPS} WHERE state = 'start'
), eff AS (
  SELECT a.removed AS channel, a.pconv, b.pconv AS base,
         CAST(round((b.pconv - a.pconv) / b.pconv, 6) AS DECIMAL(18,6)) AS re6
  FROM at_start a CROSS JOIN (SELECT pconv FROM at_start WHERE removed = 'none') b
  WHERE a.removed <> 'none'
)
SELECT channel,
       round(base, 6) AS base_pconv,
       round(pconv, 6) AS removed_pconv,
       CAST(re6 AS DOUBLE) AS removal_effect,
       round(CAST(re6 AS DOUBLE) / CAST(SUM(re6) OVER () AS DOUBLE), 6) AS attribution
FROM eff
ORDER BY channel"""
    )
    return "".join(parts)


SESSION7_QUERIES.append(
    QueryDef(
        "q_markov_attribution", _q_markov_attribution, _sql_markov_attribution(),
        "Markov removal-effect attribution (unrolled absorption)",
    )
)


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

_HURST_BLOCKS = (45, 90, 180, 360)


def _q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-count series by classic R/S
    analysis: for block sizes m in {45,90,180,360}, split the series
    into floor(T/m) blocks, compute each block's rescaled range
    R/S (range of the demeaned cumulative sum over the population
    std), average per m, and fit ln(R/S) = H ln(m) + c by OLS over the
    four points — H>0.5 = long memory, the forecastability diagnostic
    beside q_seasonal_strength.  The demeaned cumsum uses the exact
    integer m*cum - k*tot scaling (the q_drawdown trick), so R's
    numerator and the std moments are exact integers; each block's
    R/S is one double formula, per-m means sum ROUND-6 DECIMALS
    (order-free), and the final regression runs on 4 frozen points.
    Scale: one events hash aggregate + one window per block size over
    the ~720-row hourly grain."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        F.floor(F.unix_millis("ts") / F.lit(3600000.0)).cast("long").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.count(F.lit(1)).alias("y"))
    idx = hourly.select(
        "h", "y", (F.row_number().over(Window.orderBy("h")) - 1).alias("i")
    )
    # ONE pass for all block sizes: explode each hour across the 4 m's
    # with a tiny multiplier join, then a single (m, b)-partitioned
    # window — 4 separate union branches would re-derive the events
    # scan per m and pay 4x the stage overhead (measured 8.7s -> ~1s).
    mult = local_df(spark, [(m,) for m in _HURST_BLOCKS], "m int")
    blk = (
        idx.select(
            "y", "i", F.count(F.lit(1)).over(Window.partitionBy()).alias("t")
        )
        .crossJoin(F.broadcast(mult))
        .select(
            "y",
            "m",
            F.floor(F.col("i") / F.col("m")).cast("long").alias("b"),
            (F.col("i") % F.col("m")).alias("k"),
            F.col("t"),
        )
        .filter(F.col("b") < F.floor(F.col("t") / F.col("m")).cast("long"))
        .drop("t")
    )
    wb = Window.partitionBy("m", "b").orderBy("k")
    wall = Window.partitionBy("m", "b")
    scanned = blk.select(
        "m",
        "b",
        F.sum("y").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.row_number().over(wb).alias("kk"),
        F.sum("y").over(wall).alias("tot"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("totsq"),
    )
    dev = scanned.select(
        "m",
        "b",
        "tot",
        "totsq",
        (F.col("m") * F.col("cum") - F.col("kk") * F.col("tot")).alias("s"),
    )
    per_block = dev.groupBy("m", "b", "tot", "totsq").agg(
        F.max("s").alias("smax"), F.min("s").alias("smin")
    )
    md = F.col("m").cast(_D)
    r = (
        F.greatest(F.col("smax"), F.lit(0)).cast(_D)
        - F.least(F.col("smin"), F.lit(0)).cast(_D)
    ) / md
    s = F.sqrt(
        (md * F.col("totsq").cast(_D) - F.col("tot").cast(_D) * F.col("tot").cast(_D))
    ) / md
    per_m = per_block.select(
        "m",
        F.round(r / s, 6).cast("decimal(18,6)").alias("rs"),
    )
    mean_rs = per_m.groupBy("m").agg(
        F.count(F.lit(1)).alias("nb"),
        F.round(F.sum("rs").cast(_D) / F.count(F.lit(1)).cast(_D), 6).alias("mean_rs"),
    )
    pts = mean_rs.select(
        "m",
        "nb",
        "mean_rs",
        F.round(F.log(F.col("m").cast(_D)), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log("mean_rs"), 6).cast("decimal(18,6)").alias("yy"),
    )
    wall = Window.partitionBy()
    mom = pts.select(
        "*",
        F.count(F.lit(1)).over(wall).alias("np"),
        F.sum("x").over(wall).alias("sx"),
        F.sum("yy").over(wall).alias("sy"),
        F.sum(F.col("x") * F.col("yy")).over(wall).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wall).alias("sxx"),
    )
    npd = F.col("np").cast(_D)
    hurst = (
        npd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)
    ) / (npd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D))
    return mom.select(
        F.col("m").cast("int").alias("block_size"),
        F.col("nb").cast("bigint").alias("n_blocks"),
        F.col("mean_rs").cast(_D).alias("mean_rs"),
        F.round(hurst, 6).alias("hurst"),
    ).orderBy("block_size")


def _sql_hurst() -> str:
    blocks = []
    for m in _HURST_BLOCKS:
        blocks.append(
            f"""
  SELECT m, CAST(round(
    ((CASE WHEN smax > 0 THEN CAST(smax AS DOUBLE) ELSE 0 END
      - CASE WHEN smin < 0 THEN CAST(smin AS DOUBLE) ELSE 0 END) / CAST(m AS DOUBLE))
    / (sqrt(CAST(m AS DOUBLE) * CAST(totsq AS DOUBLE)
            - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) / CAST(m AS DOUBLE)), 6)
    AS DECIMAL(18,6)) AS rs
  FROM (
    SELECT b, m, tot, totsq, MAX(s) AS smax, MIN(s) AS smin
    FROM (
      SELECT b, m, tot, totsq, m * cum - kk * tot AS s
      FROM (
        SELECT b, {m} AS m, y,
               SUM(y) OVER (PARTITION BY b ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum,
               ROW_NUMBER() OVER (PARTITION BY b ORDER BY k) AS kk,
               SUM(y) OVER (PARTITION BY b) AS tot,
               SUM(y * y) OVER (PARTITION BY b) AS totsq
        FROM (
          SELECT y, (i // {m}) AS b, (i % {m}) AS k,
                 COUNT(*) OVER () AS t
          FROM idx
        ) WHERE b < t // {m}
      )
    ) GROUP BY 1, 2, 3, 4
  )"""
        )
    rs_union = "\n  UNION ALL\n".join(blocks)
    return f"""
WITH hourly AS (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h, COUNT(*) AS y
  FROM events GROUP BY 1
), idx AS MATERIALIZED (
  SELECT h, y, ROW_NUMBER() OVER (ORDER BY h) - 1 AS i FROM hourly
), rs AS MATERIALIZED ({rs_union}
), mean_rs AS (
  SELECT m, COUNT(*) AS nb,
         round(CAST(SUM(rs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_rs
  FROM rs GROUP BY 1
), pts AS (
  SELECT m, nb, mean_rs,
         CAST(round(ln(CAST(m AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         CAST(round(ln(mean_rs), 6) AS DECIMAL(18,6)) AS yy
  FROM mean_rs
), mom AS (
  SELECT *, COUNT(*) OVER () AS np,
         SUM(x) OVER () AS sx, SUM(yy) OVER () AS sy,
         SUM(x * yy) OVER () AS sxy, SUM(x * x) OVER () AS sxx
  FROM pts
)
SELECT CAST(m AS INT) AS block_size, CAST(nb AS BIGINT) AS n_blocks,
       CAST(mean_rs AS DOUBLE) AS mean_rs,
       round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS hurst
FROM mom
ORDER BY block_size
"""


SESSION7_QUERIES.append(
    QueryDef(
        "q_hurst", _q_hurst, _sql_hurst(),
        "Hurst exponent via R/S analysis (4 block sizes)",
    )
)


# ---------------------------------------------------------------------------
# Tukey median polish of the nation x priority median-price table
# ---------------------------------------------------------------------------

_MP_ITERS = 2


def _q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the 25x5 nation x order-priority table
    of median order prices: alternately sweep out row and column
    medians (2 full iterations) to split each cell into row effect +
    column effect + residual — the robust two-way decomposition that
    survives wild cells where a mean-based ANOVA table would not.
    Cell medians are EXACT lower order statistics (rank (n+1)/2) in
    canonical DECIMAL(18,2); every sweep subtracts exact decimals, so
    the whole decomposition is float-free.

    Architecture (the q_markov_attribution / Lloyd-loop precedent):
    Spark reduces orders+customer to the 125-cell median table (the
    distributed work: one broadcast join + per-cell rank pick); the
    4 polish sweeps run driver-side on the collected 125 decimals —
    O(|nations| x |priorities|) at ANY data size.  The oracle unrolls
    the identical sweeps as chained SQL CTEs."""
    from decimal import Decimal

    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey"])
    nation = scan(spark, cat, "nation", ["n_nationkey", "n_name"])
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_orderpriority", money("o_totalprice").alias("y"))
    )
    wc = Window.partitionBy("n_name", "o_orderpriority").orderBy("y")
    cells = (
        base.select(
            "n_name",
            "o_orderpriority",
            "y",
            F.row_number().over(wc).alias("r"),
            F.count(F.lit(1)).over(
                Window.partitionBy("n_name", "o_orderpriority")
            ).alias("cnt"),
        )
        .filter(F.col("r") * 2 == F.col("cnt") + (F.col("cnt") % 2))
        .select("n_name", "o_orderpriority", F.col("y").alias("cell"))
    )
    rows = cells.collect()  # bounded: |nations| x |priorities| rows

    cell = {(r["n_name"], r["o_orderpriority"]): Decimal(r["cell"]) for r in rows}
    ns = sorted({a for a, _ in cell})
    ps = sorted({b for _, b in cell})

    def lower_median(vals: list[Decimal]) -> Decimal:
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    row_eff = {a: Decimal(0) for a in ns}
    col_eff = {b: Decimal(0) for b in ps}
    work = dict(cell)
    for _ in range(_MP_ITERS):
        for a in ns:
            med = lower_median([work[(a, b)] for b in ps if (a, b) in work])
            row_eff[a] += med
            for b in ps:
                if (a, b) in work:
                    work[(a, b)] -= med
        for b in ps:
            med = lower_median([work[(a, b)] for a in ns if (a, b) in work])
            col_eff[b] += med
            for a in ns:
                if (a, b) in work:
                    work[(a, b)] -= med
    out = [
        (
            a,
            b,
            float(cell[(a, b)]),
            float(row_eff[a]),
            float(col_eff[b]),
            float(work[(a, b)]),
        )
        for (a, b) in sorted(cell)
    ]
    return local_df(spark, 
        out,
        "n_name string, o_orderpriority string, cell_median double, "
        "row_effect double, col_effect double, residual double",
    )


def _sql_median_polish() -> str:
    head = """
WITH base AS (
  SELECT n_name, o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
), cells0 AS MATERIALIZED (
  SELECT n_name, o_orderpriority, y AS cell FROM (
    SELECT n_name, o_orderpriority, y,
           ROW_NUMBER() OVER (PARTITION BY n_name, o_orderpriority ORDER BY y) AS r,
           COUNT(*) OVER (PARTITION BY n_name, o_orderpriority) AS cnt
    FROM base
  ) WHERE r * 2 = cnt + (cnt % 2)
)"""
    parts = [head]
    cur = "cells0"
    row_terms, col_terms = [], []
    for it in range(1, _MP_ITERS + 1):
        rm, after_r = f"rmed{it}", f"cells_r{it}"
        parts.append(
            f""",
{rm} AS MATERIALIZED (
  SELECT n_name, cell AS med FROM (
    SELECT n_name, cell,
           ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cell) AS r,
           COUNT(*) OVER (PARTITION BY n_name) AS cnt
    FROM {cur}
  ) WHERE r * 2 = cnt + (cnt % 2)
), {after_r} AS MATERIALIZED (
  SELECT c.n_name, c.o_orderpriority, c.cell - m.med AS cell
  FROM {cur} c JOIN {rm} m USING (n_name)
)"""
        )
        cm, after_c = f"cmed{it}", f"cells_c{it}"
        parts.append(
            f""",
{cm} AS MATERIALIZED (
  SELECT o_orderpriority, cell AS med FROM (
    SELECT o_orderpriority, cell,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cell) AS r,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
    FROM {after_r}
  ) WHERE r * 2 = cnt + (cnt % 2)
), {after_c} AS MATERIALIZED (
  SELECT c.n_name, c.o_orderpriority, c.cell - m.med AS cell
  FROM {after_r} c JOIN {cm} m USING (o_orderpriority)
)"""
        )
        cur = after_c
        row_terms.append(f"(SELECT med FROM rmed{it} r WHERE r.n_name = c0.n_name)")
        col_terms.append(
            f"(SELECT med FROM cmed{it} m WHERE m.o_orderpriority = c0.o_orderpriority)"
        )
    parts.append(
        f"""
SELECT c0.n_name, c0.o_orderpriority,
       CAST(c0.cell AS DOUBLE) AS cell_median,
       CAST({' + '.join(row_terms)} AS DOUBLE) AS row_effect,
       CAST({' + '.join(col_terms)} AS DOUBLE) AS col_effect,
       CAST(f.cell AS DOUBLE) AS residual
FROM cells0 c0 JOIN {cur} f USING (n_name, o_orderpriority)
ORDER BY c0.n_name, c0.o_orderpriority"""
    )
    return "".join(parts)


SESSION7_QUERIES.append(
    QueryDef(
        "q_median_polish", _q_median_polish, _sql_median_polish(),
        "Tukey median polish, 2 exact-decimal iterations",
    )
)


# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance, exact integer numerator
# ---------------------------------------------------------------------------


def _q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein (earth mover's) distance between the
    'view' and 'purchase' value distributions: W1 = integral of
    |CDF1 - CDF2| = sum over consecutive pooled distinct values of
    |c1*n2 - c2*n1| * gap / (n1*n2) — the optimal-transport metric
    beside q_ks_test's sup-distance, and EXACT: counts, the scaled
    CDF difference, and the cent-unit gaps are all integers, so the
    accumulated numerator is one exact integer and W1 is a single
    final division.  Scale: one hash aggregate to the compressed
    pooled value domain + one cumulative window + one lead."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_type", money("value").alias("v"))
    per_v = ev.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
    )
    wv = Window.orderBy("v")
    wc = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    cum = per_v.select(
        "v",
        F.sum("a").over(wc).alias("ca"),
        F.sum("b").over(wc).alias("cb"),
        F.sum("a").over(wall).alias("n1"),
        F.sum("b").over(wall).alias("n2"),
        ((F.lead("v").over(wv) - F.col("v")) * 100).cast("long").alias("gap_cents"),
    ).filter(F.col("gap_cents").isNotNull())
    agg = cum.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(
            F.abs(
                F.col("ca").cast("decimal(38,0)") * F.col("n2")
                - F.col("cb").cast("decimal(38,0)") * F.col("n1")
            )
            * F.col("gap_cents")
        ).alias("num"),
        F.count(F.lit(1)).alias("n_steps"),
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_view"),
        F.col("n2").cast("bigint").alias("n_purchase"),
        F.col("n_steps").cast("bigint").alias("n_steps"),
        F.round(
            F.col("num").cast(_D)
            / (F.col("n1").cast(_D) * F.col("n2").cast(_D))
            / 100.0,
            6,
        ).alias("w1_dist"),
    )


_SQL_WASSERSTEIN = """
WITH per_v AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
), cum AS (
  SELECT v,
         SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
         SUM(a) OVER () AS n1, SUM(b) OVER () AS n2,
         CAST((lead(v) OVER (ORDER BY v) - v) * 100 AS BIGINT) AS gap_cents
  FROM per_v
), agg AS (
  SELECT MAX(n1) AS n1, MAX(n2) AS n2, COUNT(*) AS n_steps,
         SUM(abs(CAST(ca AS HUGEINT) * n2 - CAST(cb AS HUGEINT) * n1)
             * gap_cents) AS num
  FROM cum WHERE gap_cents IS NOT NULL
)
SELECT CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
       CAST(n_steps AS BIGINT) AS n_steps,
       round(CAST(num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / 100.0, 6) AS w1_dist
FROM agg
"""


# ---------------------------------------------------------------------------
# Kendall's tau-b via the compressed contingency table
# ---------------------------------------------------------------------------


def _q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between customer acctbal decile and order-count
    decile: concordant/discordant pairs counted EXACTLY on the 10x10
    contingency table (cell x cell double sum — 10^4 combinations,
    never the n^2 customer pairs), with full tie corrections — the
    rank-correlation complement to q_spearman that tolerates heavy
    ties.  Every count, C, D, and the tie terms are exact integers;
    tau-b is one double formula.  Scale: one orders rollup, two ntile
    windows over customers, one 100-cell aggregate, one 100x100
    self-join."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey"])
    cnts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("k"))
    joined = cust.join(cnts, cust.c_custkey == cnts.o_custkey, "left").select(
        "c_custkey",
        money("c_acctbal").alias("bal"),
        F.coalesce("k", F.lit(0)).alias("k"),
    )
    binned = joined.select(
        F.ntile(10).over(Window.orderBy("bal", "c_custkey")).alias("x"),
        F.ntile(10).over(Window.orderBy("k", "c_custkey")).alias("y"),
    )
    cells = binned.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n"))
    other = cells.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("n").alias("n2")
    )
    pairs = cells.crossJoin(other)
    conc = pairs.filter(
        (F.col("x2") > F.col("x")) & (F.col("y2") > F.col("y"))
    ).agg(F.sum(F.col("n") * F.col("n2")).alias("c"))
    disc = pairs.filter(
        (F.col("x2") > F.col("x")) & (F.col("y2") < F.col("y"))
    ).agg(F.sum(F.col("n") * F.col("n2")).alias("d"))
    tx = cells.groupBy("x").agg(F.sum("n").alias("t")).agg(
        F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("n1"),
        F.sum("t").alias("n")
    )
    ty = cells.groupBy("y").agg(F.sum("n").alias("u")).agg(
        F.sum(F.col("u") * (F.col("u") - 1) / 2).cast("long").alias("n2t")
    )
    j = conc.crossJoin(disc).crossJoin(tx).crossJoin(ty)
    nd = F.col("n").cast(_D)
    n0 = nd * (nd - 1.0) / 2.0
    tau = (F.col("c") - F.col("d")).cast(_D) / F.sqrt(
        (n0 - F.col("n1").cast(_D)) * (n0 - F.col("n2t").cast(_D))
    )
    return j.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.col("n1").cast("bigint").alias("ties_x"),
        F.col("n2t").cast("bigint").alias("ties_y"),
        F.round(tau, 6).alias("tau_b"),
    )


_SQL_KENDALL_TAU = """
WITH cnts AS (
  SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1
), joined AS (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         COALESCE(k, 0) AS k
  FROM customer LEFT JOIN cnts ON c_custkey = o_custkey
), binned AS (
  SELECT NTILE(10) OVER (ORDER BY bal, c_custkey) AS x,
         NTILE(10) OVER (ORDER BY k, c_custkey) AS y
  FROM joined
), cells AS MATERIALIZED (
  SELECT x, y, COUNT(*) AS n FROM binned GROUP BY 1, 2
), conc AS (
  SELECT SUM(a.n * b.n) AS c FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y
), disc AS (
  SELECT SUM(a.n * b.n) AS d FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y
), tx AS (
  SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1, SUM(t) AS n
  FROM (SELECT SUM(n) AS t FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(u * (u - 1) / 2) AS BIGINT) AS n2t
  FROM (SELECT SUM(n) AS u FROM cells GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
       CAST(n1 AS BIGINT) AS ties_x, CAST(n2t AS BIGINT) AS ties_y,
       round(CAST(c - d AS DOUBLE)
             / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                     - CAST(n1 AS DOUBLE))
                    * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                       - CAST(n2t AS DOUBLE))), 6) AS tau_b
FROM conc CROSS JOIN disc CROSS JOIN tx CROSS JOIN ty
"""


# ---------------------------------------------------------------------------
# Hill estimator for the heavy-tail index
# ---------------------------------------------------------------------------


def _q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail index of order totalprice: with
    x_min the exact discrete P90 order statistic, alpha = n_tail /
    sum(ln(x_i / x_min)) over the strict tail — the standard
    heavy-tail (power-law) diagnostic for revenue distributions.
    The log terms are frozen per COMPRESSED distinct value (round-6
    DECIMAL times the integer count), so the accumulated denominator
    is exact and only alpha is a double.  Scale: one cumulative
    window over the compressed value domain + one tail aggregate."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_totalprice"])
    per_v = orders.select(money("o_totalprice").alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "v",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    xmin = cum.filter(
        (F.expr("(90 * n + 99) div 100") > F.col("cum") - F.col("cnt"))
        & (F.expr("(90 * n + 99) div 100") <= F.col("cum"))
    ).select(F.col("v").alias("xmin"))
    tail = per_v.crossJoin(F.broadcast(xmin)).filter(F.col("v") > F.col("xmin"))
    terms = tail.select(
        "cnt",
        "xmin",
        (
            F.round(F.log(F.col("v").cast(_D) / F.col("xmin").cast(_D)), 6)
            .cast("decimal(18,6)")
            * F.col("cnt")
        ).alias("term"),
    )
    agg = terms.groupBy("xmin").agg(
        F.sum("cnt").alias("n_tail"), F.sum("term").alias("denom")
    )
    alpha = F.col("n_tail").cast(_D) / F.col("denom").cast(_D)
    return agg.select(
        F.col("xmin").cast(_D).alias("x_min"),
        F.col("n_tail").cast("bigint").alias("n_tail"),
        F.round(alpha, 6).alias("hill_alpha"),
        F.round(alpha / F.sqrt(F.col("n_tail").cast(_D)), 6).alias("alpha_se"),
    )


_SQL_HILL_TAIL = """
WITH per_v AS MATERIALIZED (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v, COUNT(*) AS cnt
  FROM orders GROUP BY 1
), cum AS (
  SELECT v, cnt,
         SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS n
  FROM per_v
), xmin AS (
  SELECT v AS xmin FROM cum
  WHERE (90 * n + 99) // 100 > cum - cnt AND (90 * n + 99) // 100 <= cum
), agg AS (
  SELECT xmin, SUM(cnt) AS n_tail,
         SUM(CAST(round(ln(CAST(v AS DOUBLE) / CAST(xmin AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) * cnt) AS denom
  FROM per_v CROSS JOIN xmin WHERE v > xmin
  GROUP BY 1
)
SELECT CAST(xmin AS DOUBLE) AS x_min, CAST(n_tail AS BIGINT) AS n_tail,
       round(CAST(n_tail AS DOUBLE) / CAST(denom AS DOUBLE), 6) AS hill_alpha,
       round(CAST(n_tail AS DOUBLE) / CAST(denom AS DOUBLE)
             / sqrt(CAST(n_tail AS DOUBLE)), 6) AS alpha_se
FROM agg
"""


# ---------------------------------------------------------------------------
# funnel time-to-convert percentiles
# ---------------------------------------------------------------------------


def _q_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from first
    'view' to the first 'purchase' AFTER it, summarized as exact
    discrete P25/P50/P75/P90 over users plus the mean — the latency
    readout that turns q_funnel's step counts into durations.
    Latencies are exact integer seconds; the percentile picks use the
    compressed cumulative-rank pattern; the mean divides an exact
    integer sum once.  Scale: one per-user aggregate + one compressed
    quantile pass."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("user_id", "event_type", F.unix_seconds(F.col("ts")).alias("sec"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias("tv")
    )
    first_p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user.filter(F.col("tv").isNotNull()), "user_id")
        .filter(F.col("sec") >= F.col("tv"))
        .groupBy("user_id", "tv")
        .agg(F.min("sec").alias("tp"))
        .select((F.col("tp") - F.col("tv")).alias("lat"))
    )
    per_v = first_p.groupBy("lat").agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.orderBy("lat").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "lat",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
        F.sum(F.col("lat") * F.col("cnt")).over(Window.partitionBy()).alias("s"),
    )

    def pick(q: int, alias: str):
        rank = F.expr(f"({q} * n + 99) div 100")
        return (
            cum.filter((rank > F.col("cum") - F.col("cnt")) & (rank <= F.col("cum")))
            .select(F.col("lat").alias(alias), F.col("n").alias(f"n_{alias}"),
                    F.col("s").alias(f"s_{alias}"))
        )

    out = (
        pick(25, "p25")
        .crossJoin(pick(50, "p50").select("p50"))
        .crossJoin(pick(75, "p75").select("p75"))
        .crossJoin(pick(90, "p90").select("p90"))
    )
    return out.select(
        F.col("n_p25").cast("bigint").alias("n_users"),
        F.col("p25").cast("bigint").alias("p25_secs"),
        F.col("p50").cast("bigint").alias("p50_secs"),
        F.col("p75").cast("bigint").alias("p75_secs"),
        F.col("p90").cast("bigint").alias("p90_secs"),
        F.round(F.col("s_p25").cast(_D) / F.col("n_p25").cast(_D), 2).alias(
            "mean_secs"
        ),
    )


_SQL_FUNNEL_TIME = """
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) // 1000 AS sec
  FROM events WHERE event_type IN ('view', 'purchase')
), per_user AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN sec END) AS tv
  FROM ev GROUP BY 1
), lats AS (
  SELECT e.user_id, MIN(e.sec) - p.tv AS lat
  FROM ev e JOIN per_user p USING (user_id)
  WHERE e.event_type = 'purchase' AND p.tv IS NOT NULL AND e.sec >= p.tv
  GROUP BY e.user_id, p.tv
), cum AS MATERIALIZED (
  SELECT lat, cnt,
         SUM(cnt) OVER (ORDER BY lat ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS n,
         SUM(lat * cnt) OVER () AS s
  FROM (SELECT lat, COUNT(*) AS cnt FROM lats GROUP BY 1)
)
SELECT CAST(p25.n AS BIGINT) AS n_users,
       CAST(p25.lat AS BIGINT) AS p25_secs,
       CAST(p50.lat AS BIGINT) AS p50_secs,
       CAST(p75.lat AS BIGINT) AS p75_secs,
       CAST(p90.lat AS BIGINT) AS p90_secs,
       round(CAST(p25.s AS DOUBLE) / CAST(p25.n AS DOUBLE), 2) AS mean_secs
FROM (SELECT * FROM cum WHERE (25 * n + 99) // 100 > cum - cnt
                          AND (25 * n + 99) // 100 <= cum) p25
CROSS JOIN (SELECT lat FROM cum WHERE (50 * n + 99) // 100 > cum - cnt
                                  AND (50 * n + 99) // 100 <= cum) p50
CROSS JOIN (SELECT lat FROM cum WHERE (75 * n + 99) // 100 > cum - cnt
                                  AND (75 * n + 99) // 100 <= cum) p75
CROSS JOIN (SELECT lat FROM cum WHERE (90 * n + 99) // 100 > cum - cnt
                                  AND (90 * n + 99) // 100 <= cum) p90
"""


SESSION7_QUERIES.extend(
    [
        QueryDef(
            "q_wasserstein", _q_wasserstein, _SQL_WASSERSTEIN,
            "exact 1-Wasserstein distance (integer numerator)",
        ),
        QueryDef(
            "q_kendall_tau", _q_kendall_tau, _SQL_KENDALL_TAU,
            "Kendall tau-b via the compressed contingency table",
        ),
        QueryDef(
            "q_hill_tail", _q_hill_tail, _SQL_HILL_TAIL,
            "Hill heavy-tail index at the exact P90 cut",
        ),
        QueryDef(
            "q_funnel_time", _q_funnel_time, _SQL_FUNNEL_TIME,
            "funnel time-to-convert exact percentiles",
        ),
    ]
)


# ---------------------------------------------------------------------------
# partition-skew audit on md5-replicable buckets
# ---------------------------------------------------------------------------

_SKEW_BUCKETS = 32


def _q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew audit of the lineitem join key: bucket
    l_orderkey into 32 md5-derived buckets (the engine-portable stand-
    in for a shuffle partitioner) and report the size histogram's
    skew diagnostics — max/avg ratio, top-bucket share, and the CV —
    the pre-flight check that tells you whether a 100 TB shuffle on
    this key needs salting BEFORE the job runs.  All counts exact;
    the three ratios are one double formula each.  Scale: one hash
    aggregate to the 32-row bucket grain."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", ["l_orderkey"])
    bucket = (
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % _SKEW_BUCKETS
    )
    per_b = li.select(bucket.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("n")
    )
    wall = Window.partitionBy()
    stats = per_b.select(
        "b",
        "n",
        F.sum("n").over(wall).alias("tot"),
        F.max("n").over(wall).alias("mx"),
        F.count(F.lit(1)).over(wall).alias("nb"),
        F.sum(F.col("n") * F.col("n")).over(wall).alias("nsq"),
    ).filter(F.col("n") == F.col("mx")).limit(1)
    totd = F.col("tot").cast(_D)
    nbd = F.col("nb").cast(_D)
    avg = totd / nbd
    var = (nbd * F.col("nsq").cast(_D) - totd * totd) / (nbd * nbd)
    return stats.select(
        F.col("nb").cast("int").alias("n_buckets"),
        F.col("tot").cast("bigint").alias("n_rows"),
        F.col("mx").cast("bigint").alias("max_bucket"),
        F.round(F.col("mx").cast(_D) / avg, 6).alias("skew_factor"),
        F.round(F.col("mx").cast(_D) / totd, 6).alias("top_share"),
        F.round(F.sqrt(var) / avg, 6).alias("cv"),
    )


_SQL_SKEW_AUDIT = f"""
WITH per_b AS (
  SELECT CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 4)) AS BIGINT)
         % {_SKEW_BUCKETS} AS b,
         COUNT(*) AS n
  FROM lineitem
  GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS nb, SUM(n) AS tot, MAX(n) AS mx,
         SUM(n * n) AS nsq
  FROM per_b
)
SELECT CAST(nb AS INT) AS n_buckets,
       CAST(tot AS BIGINT) AS n_rows,
       CAST(mx AS BIGINT) AS max_bucket,
       round(CAST(mx AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(nb AS DOUBLE)), 6)
         AS skew_factor,
       round(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS top_share,
       round(sqrt((CAST(nb AS DOUBLE) * CAST(nsq AS DOUBLE)
                   - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                  / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))
             / (CAST(tot AS DOUBLE) / CAST(nb AS DOUBLE)), 6) AS cv
FROM stats
"""


# ---------------------------------------------------------------------------
# Zipf's-law fit over the token frequency distribution
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100


def _q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent of the corpus token distribution: OLS slope
    of ln(freq) on ln(rank) over the top-100 tokens (count-desc,
    token tie-break) — the vocabulary-shape diagnostic for training
    corpora (natural text sits near -1; templated/synthetic text
    drifts flatter).  Both logs are frozen round-6 DECIMALS, the five
    moments are exact decimal sums, and the slope/intercept are one
    double formula each.  Scale: one explode + token hash aggregate
    (the q_word_count shape), top-k, then a 100-row reduce."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["text"])
    freqs = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        freqs.withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
        )
        .filter(F.col("rank") <= _ZIPF_TOP)
    )
    pts = top.select(
        F.round(F.log(F.col("rank").cast(_D)), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log(F.col("n").cast(_D)), 6).cast("decimal(18,6)").alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    kd = F.col("k").cast(_D)
    slope = (kd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)) / (
        kd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    )
    intercept = (F.col("sy").cast(_D) - slope * F.col("sx").cast(_D)) / kd
    return mom.select(
        F.col("k").cast("bigint").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("ln_c"),
    )


_SQL_ZIPF_FIT = rf"""
WITH freqs AS (
  SELECT token, COUNT(*) AS n
  FROM documents, UNNEST(string_split_regex(lower(text), '\s+')) AS u(token)
  WHERE token <> ''
  GROUP BY 1
), top AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank
  FROM freqs
  QUALIFY rank <= {_ZIPF_TOP}
), pts AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         CAST(round(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
  FROM top
), mom AS (
  SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts
)
SELECT CAST(k AS BIGINT) AS n_tokens,
       round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
       round((CAST(sy AS DOUBLE)
              - ((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(k AS DOUBLE), 6) AS ln_c
FROM mom
"""


# ---------------------------------------------------------------------------
# count-model overdispersion (negative-binomial method of moments)
# ---------------------------------------------------------------------------


def _q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnostics of per-user event counts by type:
    variance/mean ratio (Poisson = 1) and the negative-binomial
    method-of-moments dispersion alpha = (var - mean)/mean^2 — the
    count-model selection check before fitting arrival models.
    Per-user counts and their squares are exact integers from one
    aggregate pair; the two ratios are double formulas.  Scale: one
    (user,type) aggregate + one 5-row moment reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "event_type")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    mom = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("s"),
        F.sum(F.col("k") * F.col("k")).alias("sq"),
    )
    nd = F.col("n").cast(_D)
    mean = F.col("s").cast(_D) / nd
    var = (nd * F.col("sq").cast(_D) - F.col("s").cast(_D) * F.col("s").cast(_D)) / (
        nd * (nd - 1.0)
    )
    return mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_users"),
        F.round(mean, 6).alias("mean_count"),
        F.round(var, 6).alias("var_count"),
        F.round(var / mean, 6).alias("vmr"),
        F.round((var - mean) / (mean * mean), 6).alias("nb_alpha"),
    ).orderBy("event_type")


_SQL_DISPERSION = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS k FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type, COUNT(*) AS n, SUM(k) AS s, SUM(k * k) AS sq
  FROM per_user GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_users,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_count,
       round((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS var_count,
       round(((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS vmr,
       round((((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
              - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS nb_alpha
FROM mom
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Cronbach's alpha over the event-type "items"
# ---------------------------------------------------------------------------


def _q_cronbach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha treating the 5 event types as test items and
    per-user event counts as item scores: alpha = k/(k-1) *
    (1 - sum(var_i)/var_total) — the internal-consistency coefficient
    (do users who do more of one thing do more of everything?).
    Per-item and total variances come from exact integer moments of
    the SAME user x item count matrix (missing cells are true zeros);
    alpha is one double formula.  Scale: one (user,type) aggregate,
    one pivot to per-user totals, two tiny moment reduces."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "event_type")
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    per_cell = (
        users.crossJoin(types)
        .join(
            ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k")),
            ["user_id", "event_type"],
            "left",
        )
        .select("user_id", "event_type", F.coalesce("k", F.lit(0)).alias("k"))
    )
    item_var = per_cell.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("s"),
        F.sum(F.col("k") * F.col("k")).alias("sq"),
    )
    nd = F.col("n").cast(_D)
    ivar = (nd * F.col("sq").cast(_D) - F.col("s").cast(_D) * F.col("s").cast(_D)) / (
        nd * (nd - 1.0)
    )
    sum_ivar = item_var.select(ivar.alias("v")).agg(
        F.sum("v").alias("sum_item_var"), F.count(F.lit(1)).alias("k_items")
    )
    per_user_tot = per_cell.groupBy("user_id").agg(F.sum("k").alias("t"))
    tot_mom = per_user_tot.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("s"),
        F.sum(F.col("t") * F.col("t")).alias("sq"),
    )
    ntd = F.col("n").cast(_D)
    tvar = (ntd * F.col("sq").cast(_D) - F.col("s").cast(_D) * F.col("s").cast(_D)) / (
        ntd * (ntd - 1.0)
    )
    j = sum_ivar.crossJoin(F.broadcast(tot_mom))
    kd = F.col("k_items").cast(_D)
    alpha = (kd / (kd - 1.0)) * (1.0 - F.col("sum_item_var") / tvar)
    return j.select(
        F.col("k_items").cast("int").alias("k_items"),
        F.col("n").cast("bigint").alias("n_users"),
        F.round(F.col("sum_item_var"), 6).alias("sum_item_var"),
        F.round(tvar, 6).alias("total_var"),
        F.round(alpha, 6).alias("cronbach_alpha"),
    )


_SQL_CRONBACH = """
WITH per_cell AS MATERIALIZED (
  SELECT u.user_id, t.event_type, COALESCE(k.k, 0) AS k
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN (SELECT user_id, event_type, COUNT(*) AS k
             FROM events GROUP BY 1, 2) k
    ON k.user_id = u.user_id AND k.event_type = t.event_type
), item_var AS (
  SELECT event_type,
         (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(k * k) AS DOUBLE)
          - CAST(SUM(k) AS DOUBLE) * CAST(SUM(k) AS DOUBLE))
         / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS v
  FROM per_cell GROUP BY 1
), sum_ivar AS (
  SELECT SUM(v) AS sum_item_var, COUNT(*) AS k_items FROM item_var
), tot_mom AS (
  SELECT COUNT(*) AS n, SUM(t) AS s, SUM(t * t) AS sq FROM (
    SELECT user_id, SUM(k) AS t FROM per_cell GROUP BY 1
  )
)
SELECT CAST(k_items AS INT) AS k_items,
       CAST(n AS BIGINT) AS n_users,
       round(sum_item_var, 6) AS sum_item_var,
       round((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS total_var,
       round((CAST(k_items AS DOUBLE) / (CAST(k_items AS DOUBLE) - 1.0))
             * (1.0 - sum_item_var
                / ((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 6)
         AS cronbach_alpha
FROM sum_ivar CROSS JOIN tot_mom
"""


SESSION7_QUERIES.extend(
    [
        QueryDef(
            "q_skew_audit", _q_skew_audit, _SQL_SKEW_AUDIT,
            "partition-skew audit on md5 buckets",
        ),
        QueryDef(
            "q_zipf_fit", _q_zipf_fit, _SQL_ZIPF_FIT,
            "Zipf exponent of the token distribution",
        ),
        QueryDef(
            "q_dispersion", _q_dispersion, _SQL_DISPERSION,
            "negative-binomial overdispersion by event type",
        ),
        QueryDef(
            "q_cronbach", _q_cronbach, _SQL_CRONBACH,
            "Cronbach's alpha over event-type items",
        ),
    ]
)


# ---------------------------------------------------------------------------
# MMD^2 with a quadratic kernel, expanded into exact moments
# ---------------------------------------------------------------------------


def _q_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum mean discrepancy (biased V-statistic) between the
    'view' and 'purchase' value samples under the quadratic kernel
    k(x,y) = (1 + xy)^2 — the kernel two-sample test WITHOUT the n^2
    pair join: the kernel expands to 1 + 2xy + x^2 y^2, so every
    expectation is a product of per-sample moments, and the moments
    (in integer cents up to the 2nd power) come from ONE aggregate.
    MMD^2 = Exx' + Eyy' - 2Exy with identically-parenthesized double
    formulas.  Scale: one 6-moment hash aggregate, period."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_type", (money("value")).cast(_D).alias("x"))
    # moments in DOLLARS as doubles would break exactness; use cents
    evc = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_type", (money("value") * 100).cast("long").alias("c"))
    mom = evc.agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == "view", F.col("c"))).alias("s1"),
        F.sum(
            F.when(F.col("event_type") == "view", F.col("c") * F.col("c"))
        ).alias("q1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("c"))).alias("s2"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("c") * F.col("c"))
        ).alias("q2"),
    )
    m1 = F.col("s1").cast(_D) / F.col("n1").cast(_D) / 100.0
    m2 = F.col("s2").cast(_D) / F.col("n2").cast(_D) / 100.0
    r1 = F.col("q1").cast(_D) / F.col("n1").cast(_D) / 10000.0
    r2 = F.col("q2").cast(_D) / F.col("n2").cast(_D) / 10000.0
    exx = 1.0 + 2.0 * m1 * m1 + r1 * r1
    eyy = 1.0 + 2.0 * m2 * m2 + r2 * r2
    exy = 1.0 + 2.0 * m1 * m2 + r1 * r2
    return mom.select(
        F.col("n1").cast("bigint").alias("n_view"),
        F.col("n2").cast("bigint").alias("n_purchase"),
        F.round(exx, 6).alias("e_xx"),
        F.round(eyy, 6).alias("e_yy"),
        F.round(exy, 6).alias("e_xy"),
        F.round(exx + eyy - 2.0 * exy, 6).alias("mmd2"),
    )


_SQL_MMD = """
WITH mom AS (
  SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN event_type = 'view' THEN c END) AS s1,
         SUM(CASE WHEN event_type = 'view' THEN c * c END) AS q1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN event_type = 'purchase' THEN c END) AS s2,
         SUM(CASE WHEN event_type = 'purchase' THEN c * c END) AS q2
  FROM (
    SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type IN ('view', 'purchase')
  )
)
SELECT CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
       round(1.0 + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
             + (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0)
               * (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0), 6) AS e_xx,
       round(1.0 + 2.0 * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                       * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
             + (CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0)
               * (CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0), 6) AS e_yy,
       round(1.0 + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                       * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
             + (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0)
               * (CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0), 6) AS e_xy,
       round((1.0 + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                        * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
              + (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0)
                * (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0))
             + (1.0 + 2.0 * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                          * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                + (CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0)
                  * (CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0))
             - 2.0 * (1.0 + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                                * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                      + (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 10000.0)
                        * (CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 10000.0)), 6)
         AS mmd2
FROM mom
"""


# ---------------------------------------------------------------------------
# Cochran-Mantel-Haenszel test across nation strata
# ---------------------------------------------------------------------------


def _q_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of (top-half acctbal within
    nation) x (has an URGENT order) association, stratified by the 25
    customer nations — the confounder-adjusted 2x2 test (a naive
    pooled chi-square would be Simpson-vulnerable).  Per-stratum cell
    counts a,b,c,d are exact integers; each stratum's E[a] and
    variance term are frozen to round-6 DECIMALS so the two
    accumulations are exact order-free decimal sums; the final CMH
    statistic is one double formula.  Scale: one per-customer rollup,
    one nation-partitioned median-rank window, one 25-stratum
    aggregate."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("y")
    )
    wn = Window.partitionBy("c_nationkey").orderBy(
        F.desc(money("c_acctbal")), "c_custkey"
    )
    wcnt = Window.partitionBy("c_nationkey")
    base = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left")
        .select(
            "c_nationkey",
            "c_custkey",
            money("c_acctbal").alias("bal"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
        .select(
            "c_nationkey",
            "y",
            (
                F.row_number().over(
                    Window.partitionBy("c_nationkey").orderBy(F.desc("bal"), "c_custkey")
                )
                * 2
                <= F.count(F.lit(1)).over(wcnt)
            )
            .cast("int")
            .alias("e"),
        )
    )
    cells = base.groupBy("c_nationkey").agg(
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 0), 1).otherwise(0)).alias("d"),
    )
    n_i = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    ea = (
        (F.col("a") + F.col("b")).cast(_D)
        * (F.col("a") + F.col("c")).cast(_D)
        / n_i.cast(_D)
    )
    vr = (
        (F.col("a") + F.col("b")).cast(_D)
        * (F.col("c") + F.col("d")).cast(_D)
        * (F.col("a") + F.col("c")).cast(_D)
        * (F.col("b") + F.col("d")).cast(_D)
        / (n_i.cast(_D) * n_i.cast(_D) * (n_i.cast(_D) - 1.0))
    )
    frozen = cells.select(
        "a",
        F.round(ea, 6).cast("decimal(18,6)").alias("ea6"),
        F.round(vr, 6).cast("decimal(18,6)").alias("vr6"),
    )
    agg = frozen.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("a").alias("sa"),
        F.sum("ea6").alias("sea"),
        F.sum("vr6").alias("svr"),
    )
    num = F.col("sa").cast(_D) - F.col("sea").cast(_D)
    stat = num * num / F.col("svr").cast(_D)
    return agg.select(
        F.col("k").cast("int").alias("n_strata"),
        F.col("sa").cast("bigint").alias("sum_a"),
        F.round(F.col("sea").cast(_D), 6).alias("sum_expected"),
        F.round(F.col("svr").cast(_D), 6).alias("sum_var"),
        F.round(stat, 6).alias("cmh_stat"),
    )


_SQL_CMH_TEST = """
WITH urgent AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM orders GROUP BY 1
), base AS (
  SELECT c_nationkey, COALESCE(y, 0) AS y,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY c_nationkey
                ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) * 2
              <= COUNT(*) OVER (PARTITION BY c_nationkey)
              THEN 1 ELSE 0 END AS e
  FROM customer LEFT JOIN urgent ON c_custkey = o_custkey
), cells AS (
  SELECT c_nationkey,
         SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS d
  FROM base GROUP BY 1
), frozen AS (
  SELECT a,
         CAST(round(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                    / CAST(a + b + c + d AS DOUBLE), 6) AS DECIMAL(18,6)) AS ea6,
         CAST(round(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
                    / (CAST(a + b + c + d AS DOUBLE)
                       * CAST(a + b + c + d AS DOUBLE)
                       * (CAST(a + b + c + d AS DOUBLE) - 1.0)), 6)
              AS DECIMAL(18,6)) AS vr6
  FROM cells
), agg AS (
  SELECT COUNT(*) AS k, SUM(a) AS sa, SUM(ea6) AS sea, SUM(vr6) AS svr
  FROM frozen
)
SELECT CAST(k AS INT) AS n_strata, CAST(sa AS BIGINT) AS sum_a,
       round(CAST(sea AS DOUBLE), 6) AS sum_expected,
       round(CAST(svr AS DOUBLE), 6) AS sum_var,
       round((CAST(sa AS DOUBLE) - CAST(sea AS DOUBLE))
             * (CAST(sa AS DOUBLE) - CAST(sea AS DOUBLE))
             / CAST(svr AS DOUBLE), 6) AS cmh_stat
FROM agg
"""


# ---------------------------------------------------------------------------
# NDCG@100 of the acctbal ranking against order-count relevance
# ---------------------------------------------------------------------------

_NDCG_K = 100


def _q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@100 of ranking customers by account balance when the true
    relevance is their order count — the position-discounted ranking
    metric beside q_auc_eval's threshold-free and q_pr_curve's
    threshold-swept views.  Discounts 1/log2(i+1) are frozen round-6
    DECIMALS, so DCG and ideal DCG are exact decimal sums of
    integer-relevance x frozen-weight products; NDCG is one double
    division.  Scale: one orders rollup + two rank windows + a
    100-row position join."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey"])
    rel = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("rel"))
    base = cust.join(rel, cust.c_custkey == rel.o_custkey, "left").select(
        "c_custkey",
        money("c_acctbal").alias("bal"),
        F.coalesce("rel", F.lit(0)).alias("rel"),
    )
    ranked = base.select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.desc("bal"), "c_custkey"))
        .alias("i"),
    ).filter(F.col("i") <= _NDCG_K)
    ideal = base.select(
        F.col("rel").alias("irel"),
        F.row_number()
        .over(Window.orderBy(F.desc("rel"), "c_custkey"))
        .alias("i"),
    ).filter(F.col("i") <= _NDCG_K)
    w = F.round(
        1.0 / F.log2(F.col("i").cast(_D) + 1.0), 6
    ).cast("decimal(18,6)")
    dcg = ranked.select((F.col("rel") * w).alias("term")).agg(
        F.sum("term").alias("dcg")
    )
    idcg = ideal.select((F.col("irel") * w).alias("term")).agg(
        F.sum("term").alias("idcg")
    )
    j = dcg.crossJoin(F.broadcast(idcg))
    return j.select(
        F.lit(_NDCG_K).cast("int").alias("k"),
        F.round(F.col("dcg").cast(_D), 6).alias("dcg"),
        F.round(F.col("idcg").cast(_D), 6).alias("idcg"),
        F.round(F.col("dcg").cast(_D) / F.col("idcg").cast(_D), 6).alias("ndcg"),
    )


_SQL_NDCG = f"""
WITH rel AS (
  SELECT o_custkey, COUNT(*) AS rel FROM orders GROUP BY 1
), base AS MATERIALIZED (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         COALESCE(rel, 0) AS rel
  FROM customer LEFT JOIN rel ON c_custkey = o_custkey
), ranked AS (
  SELECT rel, ROW_NUMBER() OVER (ORDER BY bal DESC, c_custkey) AS i FROM base
  QUALIFY i <= {_NDCG_K}
), ideal AS (
  SELECT rel AS irel, ROW_NUMBER() OVER (ORDER BY rel DESC, c_custkey) AS i FROM base
  QUALIFY i <= {_NDCG_K}
), dcg AS (
  SELECT SUM(rel * CAST(round(1.0 / log2(CAST(i AS DOUBLE) + 1.0), 6)
                        AS DECIMAL(18,6))) AS dcg
  FROM ranked
), idcg AS (
  SELECT SUM(irel * CAST(round(1.0 / log2(CAST(i AS DOUBLE) + 1.0), 6)
                         AS DECIMAL(18,6))) AS idcg
  FROM ideal
)
SELECT CAST({_NDCG_K} AS INT) AS k,
       round(CAST(dcg AS DOUBLE), 6) AS dcg,
       round(CAST(idcg AS DOUBLE), 6) AS idcg,
       round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg
FROM dcg CROSS JOIN idcg
"""


# ---------------------------------------------------------------------------
# Gumbel extreme-value fit on daily maxima (method of moments)
# ---------------------------------------------------------------------------

# frozen constants: sqrt(6)/pi and the Euler-Mascheroni gamma
_EVT_SQRT6_PI = 0.779697
_EVT_GAMMA = 0.577216
# -ln(-ln(0.99)): the 99% Gumbel quantile multiplier
_EVT_Q99 = 4.600149


def _q_evt_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit on the daily maxima of purchase
    values (method of moments): beta = s*sqrt(6)/pi, mu = m - gamma*
    beta, and the implied 99th-percentile daily max mu + beta*4.600149
    — block-maxima EVT, the tail-risk counterpart to q_hill_tail's
    full-tail index.  Daily maxima are exact decimals; their two
    moments are exact integer-cent sums; the three estimates are
    double formulas with frozen constants.  Scale: one daily-max
    aggregate + one 2-moment reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (F.max(money("value")) * 100).cast("long").alias("mx")
    )
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s"),
        F.sum(F.col("mx") * F.col("mx")).alias("sq"),
    )
    nd = F.col("n").cast(_D)
    m = F.col("s").cast(_D) / nd / 100.0
    var = (nd * F.col("sq").cast(_D) - F.col("s").cast(_D) * F.col("s").cast(_D)) / (
        nd * (nd - 1.0)
    ) / 10000.0
    beta = F.lit(_EVT_SQRT6_PI) * F.sqrt(var)
    mu = m - F.lit(_EVT_GAMMA) * beta
    return mom.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(m, 6).alias("mean_daily_max"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(mu + beta * F.lit(_EVT_Q99), 6).alias("p99_daily_max"),
    )


_SQL_EVT_GUMBEL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(MAX(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS mx
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), mom AS (
  SELECT COUNT(*) AS n, SUM(mx) AS s, SUM(mx * mx) AS sq FROM daily
)
SELECT CAST(n AS BIGINT) AS n_days,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_daily_max,
       round({_EVT_SQRT6_PI} * sqrt((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                                    / 10000.0), 6) AS gumbel_beta,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
             - {_EVT_GAMMA} * ({_EVT_SQRT6_PI}
               * sqrt((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                      / 10000.0)), 6) AS gumbel_mu,
       round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
              - {_EVT_GAMMA} * ({_EVT_SQRT6_PI}
                * sqrt((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                       / 10000.0)))
             + ({_EVT_SQRT6_PI}
                * sqrt((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                       / 10000.0)) * {_EVT_Q99}, 6) AS p99_daily_max
FROM mom
"""


SESSION7_QUERIES.extend(
    [
        QueryDef(
            "q_mmd", _q_mmd, _SQL_MMD,
            "moment-expanded quadratic-kernel MMD^2",
        ),
        QueryDef(
            "q_cmh_test", _q_cmh_test, _SQL_CMH_TEST,
            "Cochran-Mantel-Haenszel stratified 2x2 test",
        ),
        QueryDef(
            "q_ndcg", _q_ndcg, _SQL_NDCG,
            "NDCG@100 with frozen log2 discounts",
        ),
        QueryDef(
            "q_evt_gumbel", _q_evt_gumbel, _SQL_EVT_GUMBEL,
            "Gumbel EVT fit on daily maxima",
        ),
    ]
)
