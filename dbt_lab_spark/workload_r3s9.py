"""r3 session-9 additions: the regression-diagnostics suite
(Breusch-Pagan heteroscedasticity, Durbin-Watson autocorrelation,
Cook's-distance influence) and multi-change-point segmentation.
Same (builder, oracle) contract as dbt_lab_spark.workload.

The shared trick: freeze the OLS coefficients to round-6 DECIMALS
(broadcast from one exact-moment fit, the q_gbm_round f0 pattern),
then every residual is an exact decimal — rounded once to whole cents
so its SQUARES and FOURTH powers stay inside DECIMAL(38,0)/HUGEINT —
and all diagnostic statistics become exact-moment reductions.

Reference capability evidence: the reference's aggregate + join +
sort physical operators (qexec/PhysicalOperators*.java); each query
re-expresses one distributed shape a user of that surface would
build, Spark-first.
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


def _cust_spend_fit(spark: SparkSession, sf_dir: str):
    """Shared frame: per-customer (x = acctbal cents, y = spend cents)
    plus the frozen round-6 OLS coefficients (a, b) and the moment row
    broadcast alongside."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(money("o_totalprice")) * 100).cast("long").alias("y")
    )
    base = cust.join(spend, cust.c_custkey == spend.o_custkey, "left").select(
        "c_custkey",
        (money("c_acctbal") * 100).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast(_D)
    b = (nd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)) / (
        nd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    )
    a = (F.col("sy").cast(_D) - b * F.col("sx").cast(_D)) / nd
    fit = mom.select(
        "n",
        "sx",
        "sxx",
        F.round(a, 6).cast("decimal(18,6)").alias("a"),
        F.round(b, 6).cast("decimal(18,6)").alias("b"),
    )
    resid = base.crossJoin(F.broadcast(fit)).select(
        "c_custkey",
        "x",
        "y",
        "n",
        "sx",
        "sxx",
        # frozen-coefficient residual, rounded once to whole cents so
        # its 2nd/4th powers fit exact integer accumulators
        F.round(F.col("y") - (F.col("a") + F.col("b") * F.col("x")), 0)
        .cast("long")
        .alias("e"),
    )
    return resid


_SQL_CUST_SPEND_FIT = """
spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM orders GROUP BY 1
), base AS MATERIALIZED (
  SELECT c_custkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         COALESCE(y, 0) AS y
  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
), fitmom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_int,
         CAST(SUM(x) AS DOUBLE) AS sxd, SUM(x) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxxd,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
  FROM base
), fit AS MATERIALIZED (
  SELECT n_int AS n, sx, sxx,
         CAST(round((sy - ((n * sxy - sxd * sy) / (n * sxxd - sxd * sxd)) * sxd)
                    / n, 6) AS DECIMAL(18,6)) AS a,
         CAST(round((n * sxy - sxd * sy) / (n * sxxd - sxd * sxd), 6)
              AS DECIMAL(18,6)) AS b
  FROM fitmom
), resid AS MATERIALIZED (
  SELECT c_custkey, x, y, f.n, f.sx, f.sxx,
         CAST(round(y - (f.a + f.b * x), 0) AS BIGINT) AS e
  FROM base CROSS JOIN fit f
)"""


# ---------------------------------------------------------------------------
# Breusch-Pagan heteroscedasticity test
# ---------------------------------------------------------------------------


def _q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan (Koenker studentized) heteroscedasticity test on
    the spend ~ acctbal fit: regress the squared frozen residuals on x
    and report LM = n * R^2_aux against the chi2(1) 5% critical value
    — does error variance grow with the predictor?  The auxiliary
    R^2 needs residual powers up to e^4: with residuals rounded to
    integer cents they accumulate exactly in DECIMAL(38,0)/HUGEINT.
    Scale: one rollup + one frozen-fit broadcast + ONE 5-moment
    reduce."""
    resid = _cust_spend_fit(spark, sf_dir)
    e2 = F.col("e").cast("decimal(38,0)") * F.col("e")
    aux = resid.agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.max("sxx").alias("sxx"),
        F.sum(e2).alias("se2"),
        F.sum(e2 * F.col("x")).alias("se2x"),
        F.sum(e2 * e2).alias("se4"),
    )
    nd = F.col("n").cast(_D)
    cov = nd * F.col("se2x").cast(_D) - F.col("sx").cast(_D) * F.col("se2").cast(_D)
    vx = nd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    ve2 = nd * F.col("se4").cast(_D) - F.col("se2").cast(_D) * F.col("se2").cast(_D)
    r2_aux = cov * cov / (vx * ve2)
    lm = nd * r2_aux
    return aux.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(cov / vx, 6).alias("aux_slope"),
        F.round(r2_aux, 6).alias("r2_aux"),
        F.round(lm, 6).alias("lm_stat"),
        (lm > 3.841459).alias("heteroscedastic"),
    )


_SQL_BREUSCH_PAGAN = f"""
WITH {_SQL_CUST_SPEND_FIT}, aux AS (
  SELECT MAX(n) AS n, MAX(sx) AS sx, MAX(sxx) AS sxx,
         SUM(CAST(e AS HUGEINT) * e) AS se2,
         SUM(CAST(e AS HUGEINT) * e * x) AS se2x,
         SUM(CAST(CAST(e AS HUGEINT) * e AS HUGEINT)
             * (CAST(e AS HUGEINT) * e)) AS se4
  FROM resid
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round((CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS aux_slope,
       round(((CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(se4 AS DOUBLE)
                   - CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE))), 6) AS r2_aux,
       round(CAST(n AS DOUBLE)
             * ((CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(se4 AS DOUBLE)
                   - CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE))), 6) AS lm_stat,
       CAST(n AS DOUBLE)
       * ((CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(se2x AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE)))
       / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(se4 AS DOUBLE)
             - CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE))) > 3.841459
         AS heteroscedastic
FROM aux
"""


# ---------------------------------------------------------------------------
# Durbin-Watson autocorrelation of daily-revenue trend residuals
# ---------------------------------------------------------------------------


def _q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the residuals from the daily-revenue
    linear trend: DW = sum((e_t - e_{t-1})^2) / sum(e_t^2) — the
    serial-correlation check every forecasting fit needs.  The trend
    coefficients are frozen round-6 decimals, residuals round to
    integer cents, so both sums are exact integers and DW is one
    division; rho_hat = 1 - DW/2 rides along.  Scale: one daily
    rollup + one lag window + a 1-row reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg((F.sum(money("value")) * 100).cast("long").alias("y"))
        .select(
            "day",
            "y",
            (F.row_number().over(Window.orderBy("day"))).alias("t"),
        )
    )
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
    )
    nd = F.col("n").cast(_D)
    b = (nd * F.col("sty").cast(_D) - F.col("st").cast(_D) * F.col("sy").cast(_D)) / (
        nd * F.col("stt").cast(_D) - F.col("st").cast(_D) * F.col("st").cast(_D)
    )
    a = (F.col("sy").cast(_D) - b * F.col("st").cast(_D)) / nd
    fit = mom.select(
        F.round(a, 6).cast("decimal(18,6)").alias("a"),
        F.round(b, 6).cast("decimal(18,6)").alias("b"),
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "day",
        F.round(F.col("y") - (F.col("a") + F.col("b") * F.col("t")), 0)
        .cast("long")
        .alias("e"),
    )
    lagd = resid.select(
        "e", F.lag("e").over(Window.orderBy("day")).alias("e1")
    )
    agg = lagd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e")).alias("se2"),
        F.sum(
            F.when(
                F.col("e1").isNotNull(),
                (F.col("e") - F.col("e1")).cast("decimal(38,0)")
                * (F.col("e") - F.col("e1")),
            )
        ).alias("sd2"),
    )
    dw = F.col("sd2").cast(_D) / F.col("se2").cast(_D)
    return agg.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(dw, 6).alias("dw_stat"),
        F.round(1.0 - dw / 2.0, 6).alias("rho_hat"),
    )


_SQL_DURBIN_WATSON = """
WITH daily AS (
  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t FROM (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
    FROM events WHERE event_type = 'purchase' GROUP BY 1
  )
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(t) AS DOUBLE) AS st, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(t * t) AS DOUBLE) AS stt, CAST(SUM(t * y) AS DOUBLE) AS sty
  FROM daily
), fit AS (
  SELECT CAST(round((sy - ((n * sty - st * sy) / (n * stt - st * st)) * st)
                    / n, 6) AS DECIMAL(18,6)) AS a,
         CAST(round((n * sty - st * sy) / (n * stt - st * st), 6)
              AS DECIMAL(18,6)) AS b
  FROM mom
), resid AS (
  SELECT day, CAST(round(y - (f.a + f.b * t), 0) AS BIGINT) AS e
  FROM daily CROSS JOIN fit f
), lagd AS (
  SELECT e, lag(e) OVER (ORDER BY day) AS e1 FROM resid
), agg AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(e AS HUGEINT) * e) AS se2,
         SUM(CASE WHEN e1 IS NOT NULL
                  THEN CAST(e - e1 AS HUGEINT) * (e - e1) END) AS sd2
  FROM lagd
)
SELECT CAST(n AS BIGINT) AS n_days,
       round(CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE), 6) AS dw_stat,
       round(1.0 - CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE) / 2.0, 6) AS rho_hat
FROM agg
"""


# ---------------------------------------------------------------------------
# Cook's distance: top-10 influential customers
# ---------------------------------------------------------------------------

_COOKS_TOPK = 10


def _q_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most influential observations of the spend ~ acctbal fit
    by Cook's distance D_i = e_i^2 h_ii / (2 s^2 (1 - h_ii)^2) with
    leverage h_ii = 1/n + (x_i - xbar)^2 / Sxx — which single
    customers most move the fitted line?  Residuals are the shared
    frozen-fit integer cents; s^2 = sum(e^2)/(n-2) is an exact-moment
    broadcast; each D_i is one double formula; top-10 ranks on
    (D desc, custkey).  Scale: frozen-fit frame + one broadcast + one
    top-k."""
    resid = _cust_spend_fit(spark, sf_dir)
    s2row = resid.agg(
        F.max("n").alias("n2"),
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e")).alias("se2"),
    )
    scored = resid.crossJoin(F.broadcast(s2row))
    nd = F.col("n").cast(_D)
    xbar = F.col("sx").cast(_D) / nd
    sxx_c = F.col("sxx").cast(_D) - F.col("sx").cast(_D) * xbar
    h = 1.0 / nd + (F.col("x").cast(_D) - xbar) * (F.col("x").cast(_D) - xbar) / sxx_c
    s2 = F.col("se2").cast(_D) / (nd - 2.0)
    d = (
        F.col("e").cast(_D)
        * F.col("e").cast(_D)
        * h
        / (2.0 * s2 * (1.0 - h) * (1.0 - h))
    )
    top = scored.select(
        "c_custkey",
        (F.col("x").cast(_D) / 100.0).alias("acctbal"),
        (F.col("y").cast(_D) / 100.0).alias("spend"),
        F.round(h, 6).alias("leverage"),
        F.round(d, 6).alias("cooks_d"),
    ).withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("cooks_d"), "c_custkey"))
    ).filter(F.col("rank") <= _COOKS_TOPK)
    return top.select(
        "c_custkey", "acctbal", "spend", "leverage", "cooks_d",
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("rank")


_SQL_COOKS_DISTANCE = f"""
WITH {_SQL_CUST_SPEND_FIT}, s2row AS (
  SELECT MAX(n) AS n2, SUM(CAST(e AS HUGEINT) * e) AS se2 FROM resid
), scored AS (
  SELECT c_custkey,
         CAST(x AS DOUBLE) / 100.0 AS acctbal,
         CAST(y AS DOUBLE) / 100.0 AS spend,
         round(1.0 / CAST(n AS DOUBLE)
               + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE)
                      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS leverage,
         round(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)
               * (1.0 / CAST(n AS DOUBLE)
                  + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)
                         * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
               / (2.0 * (CAST(se2 AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0))
                  * (1.0 - (1.0 / CAST(n AS DOUBLE)
                     + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE)
                            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))))
                  * (1.0 - (1.0 / CAST(n AS DOUBLE)
                     + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE)
                            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))))), 6)
           AS cooks_d
  FROM resid CROSS JOIN s2row
)
SELECT c_custkey, acctbal, spend, leverage, cooks_d, CAST(rn AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cooks_d DESC, c_custkey) AS rn
  FROM scored
) WHERE rn <= {_COOKS_TOPK}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# two-change-point segmentation of the hourly series
# ---------------------------------------------------------------------------


def _q_changepoint2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares TWO-change-point segmentation of the hourly
    event-count series: the (k1 < k2) pair minimizing the 3-segment
    SSE, every candidate scored from the SAME exact-integer prefix
    sums (the q_changepoint machinery squared: a band self-join of
    the cumulative frame, ~|hours|^2/2 pairs on the COMPRESSED hourly
    grain — never a rescan per candidate).  One identically-
    parenthesized double formula per pair, argmin tie-broken on
    (k1, k2).  Scale: the pair join is bounded by the rollup grain
    (720 hours -> ~260k pairs), independent of raw event count."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        F.floor(F.unix_millis("ts") / F.lit(3600000.0)).cast("long").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.count(F.lit(1)).alias("y"))
    wc = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = hourly.select(
        "h",
        F.row_number().over(Window.orderBy("h")).alias("k"),
        F.sum("y").over(wc).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wc).alias("cyy"),
    )
    tot = hourly.agg(
        F.count(F.lit(1)).alias("hh"),
        F.sum("y").alias("ty"),
        F.sum(F.col("y") * F.col("y")).alias("tyy"),
    )
    p1 = pre.select(
        F.col("h").alias("h1"),
        F.col("k").alias("k1"),
        F.col("cy").alias("cy1"),
        F.col("cyy").alias("cyy1"),
    )
    p2 = pre.select(
        F.col("h").alias("h2"),
        F.col("k").alias("k2"),
        F.col("cy").alias("cy2"),
        F.col("cyy").alias("cyy2"),
    )
    pairs = (
        p1.join(p2, F.col("k1") < F.col("k2"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("k2") < F.col("hh"))
    )

    def seg(cyy_hi, cyy_lo, cy_hi, cy_lo, n):
        sd = (F.col(cy_hi) - (F.lit(0) if cy_lo is None else F.col(cy_lo))).cast(_D)
        qd = (F.col(cyy_hi) - (F.lit(0) if cyy_lo is None else F.col(cyy_lo))).cast(_D)
        return qd - sd * sd / n

    n1 = F.col("k1").cast(_D)
    n2 = (F.col("k2") - F.col("k1")).cast(_D)
    n3 = (F.col("hh") - F.col("k2")).cast(_D)
    sse = (
        (F.col("cyy1").cast(_D) - F.col("cy1").cast(_D) * F.col("cy1").cast(_D) / n1)
        + (
            (F.col("cyy2") - F.col("cyy1")).cast(_D)
            - (F.col("cy2") - F.col("cy1")).cast(_D)
            * (F.col("cy2") - F.col("cy1")).cast(_D)
            / n2
        )
        + (
            (F.col("tyy") - F.col("cyy2")).cast(_D)
            - (F.col("ty") - F.col("cy2")).cast(_D)
            * (F.col("ty") - F.col("cy2")).cast(_D)
            / n3
        )
    )
    best = (
        pairs.select("h1", "h2", "k1", "k2", "hh", "cy1", "cy2", "ty", sse.alias("sse"))
        .withColumn("rn", F.row_number().over(Window.orderBy("sse", "k1", "k2")))
        .filter(F.col("rn") == 1)
    )
    return best.select(
        F.col("h1").cast("bigint").alias("split1_hour"),
        F.col("h2").cast("bigint").alias("split2_hour"),
        F.round(F.col("cy1").cast(_D) / F.col("k1").cast(_D), 6).alias("mean_seg1"),
        F.round(
            (F.col("cy2") - F.col("cy1")).cast(_D)
            / (F.col("k2") - F.col("k1")).cast(_D),
            6,
        ).alias("mean_seg2"),
        F.round(
            (F.col("ty") - F.col("cy2")).cast(_D)
            / (F.col("hh") - F.col("k2")).cast(_D),
            6,
        ).alias("mean_seg3"),
        F.round(F.col("sse"), 6).alias("sse_best"),
    )


_SQL_CHANGEPOINT2 = """
WITH hourly AS (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h, COUNT(*) AS y
  FROM events GROUP BY 1
), pre AS MATERIALIZED (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS k,
         SUM(y) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cy,
         SUM(y * y) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cyy
  FROM hourly
), tot AS (
  SELECT COUNT(*) AS hh, SUM(y) AS ty, SUM(y * y) AS tyy FROM hourly
), pairs AS (
  SELECT p1.h AS h1, p2.h AS h2, p1.k AS k1, p2.k AS k2,
         p1.cy AS cy1, p1.cyy AS cyy1, p2.cy AS cy2, p2.cyy AS cyy2,
         t.hh, t.ty, t.tyy,
         (CAST(p1.cyy AS DOUBLE)
          - CAST(p1.cy AS DOUBLE) * CAST(p1.cy AS DOUBLE) / CAST(p1.k AS DOUBLE))
         + (CAST(p2.cyy - p1.cyy AS DOUBLE)
            - CAST(p2.cy - p1.cy AS DOUBLE) * CAST(p2.cy - p1.cy AS DOUBLE)
              / CAST(p2.k - p1.k AS DOUBLE))
         + (CAST(t.tyy - p2.cyy AS DOUBLE)
            - CAST(t.ty - p2.cy AS DOUBLE) * CAST(t.ty - p2.cy AS DOUBLE)
              / CAST(t.hh - p2.k AS DOUBLE)) AS sse
  FROM pre p1
  JOIN pre p2 ON p1.k < p2.k
  CROSS JOIN tot t
  WHERE p2.k < t.hh
)
SELECT CAST(h1 AS BIGINT) AS split1_hour, CAST(h2 AS BIGINT) AS split2_hour,
       round(CAST(cy1 AS DOUBLE) / CAST(k1 AS DOUBLE), 6) AS mean_seg1,
       round(CAST(cy2 - cy1 AS DOUBLE) / CAST(k2 - k1 AS DOUBLE), 6) AS mean_seg2,
       round(CAST(ty - cy2 AS DOUBLE) / CAST(hh - k2 AS DOUBLE), 6) AS mean_seg3,
       round(sse, 6) AS sse_best
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sse, k1, k2) AS rn FROM pairs
) WHERE rn = 1
"""


SESSION9_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_breusch_pagan", _q_breusch_pagan, _SQL_BREUSCH_PAGAN,
        "Breusch-Pagan LM test with frozen-fit integer residuals",
    ),
    QueryDef(
        "q_durbin_watson", _q_durbin_watson, _SQL_DURBIN_WATSON,
        "Durbin-Watson serial correlation of trend residuals",
    ),
    QueryDef(
        "q_cooks_distance", _q_cooks_distance, _SQL_COOKS_DISTANCE,
        "top-10 influence by Cook's distance",
    ),
    QueryDef(
        "q_changepoint2", _q_changepoint2, _SQL_CHANGEPOINT2,
        "two-change-point segmentation from prefix-sum pairs",
    ),
]


# ---------------------------------------------------------------------------
# Jarque-Bera normality test per event type
# ---------------------------------------------------------------------------


def _q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of event values per type: JB =
    n/6 * (g1^2 + g2^2/4) from the same exact raw power sums as
    q_higher_moments (S3/S4 in DECIMAL(38,0)/HUGEINT), flagged
    against the chi2(2) 5% critical value 5.991465 — the
    is-this-Gaussian gate before any z-test assumption.  One
    aggregate, double formulas.  Scale: one hash aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "event_type", (money("value") * 100).cast("long").alias("c")
    )
    cc = F.col("c") * F.col("c")
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(cc).alias("s2"),
        F.sum(cc.cast("decimal(38,0)") * F.col("c")).alias("s3"),
        F.sum(cc.cast("decimal(38,0)") * cc).alias("s4"),
    )
    nd = F.col("n").cast(_D)
    m = F.col("s1").cast(_D) / nd
    m2 = F.col("s2").cast(_D) / nd - m * m
    m3 = (
        F.col("s3").cast(_D) / nd
        - 3.0 * m * (F.col("s2").cast(_D) / nd)
        + 2.0 * m * m * m
    )
    m4 = (
        F.col("s4").cast(_D) / nd
        - 4.0 * m * (F.col("s3").cast(_D) / nd)
        + 6.0 * m * m * (F.col("s2").cast(_D) / nd)
        - 3.0 * m * m * m * m
    )
    g1 = m3 / F.sqrt(m2 * m2 * m2)
    g2 = m4 / (m2 * m2) - 3.0
    jb = nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    return mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(g1, 6).alias("skewness"),
        F.round(g2, 6).alias("excess_kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        (jb > 5.991465).alias("non_normal"),
    ).orderBy("event_type")


_SQL_JARQUE_BERA = """
WITH mom AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_int,
         CAST(SUM(c) AS DOUBLE) AS s1, CAST(SUM(c * c) AS DOUBLE) AS s2,
         CAST(SUM(CAST(c * c AS HUGEINT) * c) AS DOUBLE) AS s3,
         CAST(SUM(CAST(c * c AS HUGEINT) * c * c) AS DOUBLE) AS s4
  FROM (
    SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events
  ) GROUP BY 1
), shaped AS (
  SELECT event_type, n_int, n,
         (s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
         / sqrt((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) AS g1,
         (s4 / n - 4.0 * (s1 / n) * (s3 / n)
          + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
          - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
         / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3.0
           AS g2
  FROM mom
)
SELECT event_type, CAST(n_int AS BIGINT) AS n_events,
       round(g1, 6) AS skewness,
       round(g2, 6) AS excess_kurtosis,
       round(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 4) AS jb_stat,
       n / 6.0 * (g1 * g1 + g2 * g2 / 4.0) > 5.991465 AS non_normal
FROM shaped
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Theil inequality index on the compressed value domain
# ---------------------------------------------------------------------------


def _q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend per nation's market:
    T = (1/n) sum (x_i/mu) ln(x_i/mu) over positive spends — the
    decomposable inequality measure beside q_gini's rank-based one.
    Each ln(x/mu) is frozen per COMPRESSED distinct spend value
    (round-6 DECIMAL x the exact integer count and the exact integer
    value), so the accumulation is an exact decimal and T is one
    final division.  Scale: one per-customer rollup, one compressed
    aggregate."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(money("o_totalprice")) * 100).cast("long").alias("x")
    )
    per_v = spend.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per_v.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("cnt")).alias("sx"),
    )
    j = per_v.crossJoin(F.broadcast(tot))
    mu = F.col("sx").cast(_D) / F.col("n").cast(_D)
    term = (
        F.round(F.log(F.col("x").cast(_D) / mu), 6).cast("decimal(18,6)")
        * F.col("x")
        * F.col("cnt")
    )
    agg = j.groupBy("n", "sx").agg(F.sum(term).alias("st"))
    theil = F.col("st").cast(_D) / F.col("sx").cast(_D)
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(F.col("sx").cast(_D) / F.col("n").cast(_D) / 100.0, 2).alias(
            "mean_spend"
        ),
        F.round(theil, 6).alias("theil_t"),
    )


_SQL_THEIL_INDEX = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
  FROM orders GROUP BY 1
), per_v AS MATERIALIZED (
  SELECT x, COUNT(*) AS cnt FROM spend GROUP BY 1
), tot AS (
  SELECT SUM(cnt) AS n, SUM(CAST(x AS HUGEINT) * cnt) AS sx FROM per_v
), agg AS (
  SELECT n, sx,
         SUM(CAST(round(ln(CAST(x AS DOUBLE)
                           / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6)
                  AS DECIMAL(18,6)) * x * cnt) AS st
  FROM per_v CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 2) AS mean_spend,
       round(CAST(st AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS theil_t
FROM agg
"""


# ---------------------------------------------------------------------------
# Shewhart x-bar control chart on daily mean purchase value
# ---------------------------------------------------------------------------


def _q_spc_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart x-bar control chart on the daily mean purchase value:
    center line and 3-sigma limits from the grand moments (sigma of
    the daily means), each day flagged in- or out-of-control — the
    SPC monitor every data-quality pipeline wants.  Daily sums stay
    exact DECIMAL; each daily mean is one double division; the limits
    are frozen round-6 decimals broadcast to every day so the compare
    is engine-stable.  Scale: one daily rollup + one 30-row moment
    reduce + one broadcast."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("m"), F.sum(money("value")).alias("s")
    )
    means = daily.select(
        "day",
        "m",
        (F.col("s").cast(_D) / F.col("m").cast(_D)).alias("xbar"),
    )
    mom = means.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(F.col("xbar"), 6).cast("decimal(18,6)")).alias("sm"),
        F.sum(
            F.round(F.col("xbar"), 6).cast("decimal(18,6)")
            * F.round(F.col("xbar"), 6).cast("decimal(18,6)")
        ).alias("smm"),
    )
    kd = F.col("k").cast(_D)
    cl = F.col("sm").cast(_D) / kd
    sd = F.sqrt(
        (kd * F.col("smm").cast(_D) - F.col("sm").cast(_D) * F.col("sm").cast(_D))
        / (kd * (kd - 1.0))
    )
    limits = mom.select(
        F.round(cl, 6).cast("decimal(18,6)").alias("cl"),
        F.round(cl - 3.0 * sd, 6).cast("decimal(18,6)").alias("lcl"),
        F.round(cl + 3.0 * sd, 6).cast("decimal(18,6)").alias("ucl"),
    )
    flagged = means.crossJoin(F.broadcast(limits)).select(
        "day",
        F.col("m").cast("bigint").alias("n_obs"),
        F.round("xbar", 6).alias("daily_mean"),
        F.col("cl").cast(_D).alias("center"),
        F.col("lcl").cast(_D).alias("lcl"),
        F.col("ucl").cast(_D).alias("ucl"),
        (
            (F.round(F.col("xbar"), 6).cast("decimal(18,6)") < F.col("lcl"))
            | (F.round(F.col("xbar"), 6).cast("decimal(18,6)") > F.col("ucl"))
        ).alias("out_of_control"),
    )
    return flagged.orderBy("day")


_SQL_SPC_CHART = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS m,
         SUM(CAST(value AS DECIMAL(18,2))) AS s
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), means AS MATERIALIZED (
  SELECT day, m, CAST(s AS DOUBLE) / CAST(m AS DOUBLE) AS xbar FROM daily
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
         SUM(CAST(round(xbar, 6) AS DECIMAL(18,6))) AS sm,
         SUM(CAST(round(xbar, 6) AS DECIMAL(18,6))
             * CAST(round(xbar, 6) AS DECIMAL(18,6))) AS smm
  FROM means
), limits AS (
  SELECT CAST(round(CAST(sm AS DOUBLE) / k, 6) AS DECIMAL(18,6)) AS cl,
         CAST(round(CAST(sm AS DOUBLE) / k
                    - 3.0 * sqrt((k * CAST(smm AS DOUBLE)
                                  - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                                 / (k * (k - 1.0))), 6) AS DECIMAL(18,6)) AS lcl,
         CAST(round(CAST(sm AS DOUBLE) / k
                    + 3.0 * sqrt((k * CAST(smm AS DOUBLE)
                                  - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                                 / (k * (k - 1.0))), 6) AS DECIMAL(18,6)) AS ucl
  FROM mom
)
SELECT day, CAST(m AS BIGINT) AS n_obs,
       round(xbar, 6) AS daily_mean,
       CAST(cl AS DOUBLE) AS center,
       CAST(lcl AS DOUBLE) AS lcl,
       CAST(ucl AS DOUBLE) AS ucl,
       (CAST(round(xbar, 6) AS DECIMAL(18,6)) < lcl
        OR CAST(round(xbar, 6) AS DECIMAL(18,6)) > ucl) AS out_of_control
FROM means CROSS JOIN limits
ORDER BY day
"""


SESSION9_QUERIES.extend(
    [
        QueryDef(
            "q_jarque_bera", _q_jarque_bera, _SQL_JARQUE_BERA,
            "Jarque-Bera normality test from exact power sums",
        ),
        QueryDef(
            "q_theil_index", _q_theil_index, _SQL_THEIL_INDEX,
            "Theil T inequality on the compressed spend domain",
        ),
        QueryDef(
            "q_spc_chart", _q_spc_chart, _SQL_SPC_CHART,
            "Shewhart x-bar chart with frozen 3-sigma limits",
        ),
    ]
)


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank test across all event types
# ---------------------------------------------------------------------------


def _q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of value location across ALL five event
    types — the k-sample generalization of q_mann_whitney, and like it
    ENTIRELY integer until the final statistic: per-distinct-value
    counts, one pooled cumulative window, doubled average ranks
    2R = sum a_v (2 before_v + t_v + 1), group rank sums as exact
    integers, and the tie correction from exact t^3 - t sums.  Scale:
    the window runs over the compressed pooled value domain, never
    raw events; one group reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "event_type", money("value").alias("v")
    )
    per_tv = ev.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("a"))
    per_v = per_tv.groupBy("v").agg(F.sum("a").alias("tv"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "v",
        "tv",
        (F.sum("tv").over(wc) - F.col("tv")).alias("before"),
    )
    joined = per_tv.join(cum, "v").select(
        "event_type",
        "a",
        "tv",
        # doubled average pooled rank of every copy at value v
        (F.col("a").cast("decimal(38,0)") * (2 * F.col("before") + F.col("tv") + 1))
        .alias("r2"),
    )
    per_t = joined.groupBy("event_type").agg(
        F.sum("a").alias("nt"), F.sum("r2").alias("r2t")
    )
    ties = per_v.agg(
        F.sum("tv").alias("n"),
        F.sum(
            F.col("tv").cast("decimal(38,0)") * F.col("tv") * F.col("tv")
            - F.col("tv")
        ).alias("tie3"),
    )
    j = per_t.crossJoin(F.broadcast(ties))
    nd = F.col("n").cast(_D)
    # H = 12/(n(n+1)) * sum((R_t)^2/n_t) - 3(n+1); R_t = r2t/2
    term = (
        F.col("r2t").cast(_D)
        * F.col("r2t").cast(_D)
        / 4.0
        / F.col("nt").cast(_D)
    )
    agg = j.groupBy("n", "tie3").agg(
        F.count(F.lit(1)).alias("k"), F.sum(term).alias("sterm")
    )
    h = 12.0 / (nd * (nd + 1.0)) * F.col("sterm") - 3.0 * (nd + 1.0)
    c = 1.0 - F.col("tie3").cast(_D) / (nd * nd * nd - nd)
    return agg.select(
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / c, 6).alias("h_tie_corrected"),
        (h / c > 9.487729).alias("significant"),  # chi2(4) 5%
    )


_SQL_KRUSKAL_WALLIS = """
WITH per_tv AS MATERIALIZED (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v, COUNT(*) AS a
  FROM events GROUP BY 1, 2
), per_v AS MATERIALIZED (
  SELECT v, SUM(a) AS tv FROM per_tv GROUP BY 1
), cum AS (
  SELECT v, tv,
         SUM(tv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - tv AS before
  FROM per_v
), per_t AS (
  SELECT event_type, SUM(a) AS nt,
         SUM(CAST(a AS HUGEINT) * (2 * before + tv + 1)) AS r2t
  FROM per_tv JOIN cum USING (v)
  GROUP BY 1
), ties AS (
  SELECT SUM(tv) AS n,
         SUM(CAST(tv AS HUGEINT) * tv * tv - tv) AS tie3
  FROM per_v
), agg AS (
  SELECT n, tie3, COUNT(*) AS k,
         SUM(CAST(r2t AS DOUBLE) * CAST(r2t AS DOUBLE) / 4.0
             / CAST(nt AS DOUBLE)) AS sterm
  FROM per_t CROSS JOIN ties
  GROUP BY 1, 2
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(k - 1 AS INT) AS df,
       round(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sterm
             - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h_stat,
       round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sterm
              - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(tie3 AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE))), 6) AS h_tie_corrected,
       (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sterm
        - 3.0 * (CAST(n AS DOUBLE) + 1.0))
       / (1.0 - CAST(tie3 AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
             - CAST(n AS DOUBLE))) > 9.487729 AS significant
FROM agg
"""


# ---------------------------------------------------------------------------
# McNemar paired-proportions test
# ---------------------------------------------------------------------------


def _q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar test of paired per-customer indicators (ever placed an
    URGENT order vs ever placed a 2-HIGH order): only the DISCORDANT
    cells b (urgent-only) and c (high-only) matter; the statistic
    (b-c)^2/(b+c) and its continuity-corrected form are pure integer
    arithmetic until two divisions — the paired version of a
    proportions z-test.  Scale: one per-customer aggregate + one
    4-cell reduce."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_orderpriority"])
    per_c = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("u"),
        F.max((F.col("o_orderpriority") == "2-HIGH").cast("int")).alias("h"),
    )
    cells = per_c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("u") == 1) & (F.col("h") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("u") == 0) & (F.col("h") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((F.col("u") == 1) & (F.col("h") == 1), 1).otherwise(0)).alias("both"),
    )
    bd = F.col("b").cast(_D)
    cd = F.col("c").cast(_D)
    stat = (bd - cd) * (bd - cd) / (bd + cd)
    statc = (F.abs(bd - cd) - 1.0) * (F.abs(bd - cd) - 1.0) / (bd + cd)
    return cells.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("b").cast("bigint").alias("urgent_only"),
        F.col("c").cast("bigint").alias("high_only"),
        F.col("both").cast("bigint").alias("both_kinds"),
        F.round(stat, 6).alias("mcnemar_stat"),
        F.round(statc, 6).alias("mcnemar_corrected"),
        (statc > 3.841459).alias("significant"),
    )


_SQL_MCNEMAR = """
WITH per_c AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS u,
         MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS h
  FROM orders GROUP BY 1
), cells AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN u = 1 AND h = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN u = 0 AND h = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN u = 1 AND h = 1 THEN 1 ELSE 0 END) AS bb
  FROM per_c
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(b AS BIGINT) AS urgent_only, CAST(c AS BIGINT) AS high_only,
       CAST(bb AS BIGINT) AS both_kinds,
       round((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
             * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
             / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)), 6) AS mcnemar_stat,
       round((abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
             * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
             / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)), 6) AS mcnemar_corrected,
       (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
       * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
       / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) > 3.841459 AS significant
FROM cells
"""


# ---------------------------------------------------------------------------
# cumulative gains chart by score decile
# ---------------------------------------------------------------------------


def _q_gains_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains chart treating account balance as the model
    score and total spend as the response: decile customers by score
    (desc, custkey tie-break), report each decile's share of total
    spend, the cumulative share, and the cumulative lift vs random
    targeting — the campaign-targeting readout beside q_auc_eval's
    classifier view.  Spend sums stay exact DECIMAL; shares and lifts
    are single divisions; the cumulative sums run over the 10-row
    decile frame.  Scale: one rollup + one ntile window + a 10-row
    window pass."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        F.sum(money("o_totalprice")).alias("y")
    )
    base = cust.join(spend, cust.c_custkey == spend.o_custkey, "left").select(
        F.ntile(10)
        .over(Window.orderBy(F.desc(money("c_acctbal")), "c_custkey"))
        .alias("decile"),
        F.coalesce("y", F.lit(0).cast("decimal(18,2)")).alias("y"),
    )
    per_d = base.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_d.select(
        "decile",
        "n",
        "s",
        F.sum("s").over(wall).alias("st"),
        F.sum("s").over(wcum).alias("cs"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("n").over(wcum).alias("cn"),
    )
    share = F.col("s").cast(_D) / F.col("st").cast(_D)
    cshare = F.col("cs").cast(_D) / F.col("st").cast(_D)
    cpop = F.col("cn").cast(_D) / F.col("nt").cast(_D)
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(share, 6).alias("spend_share"),
        F.round(cshare, 6).alias("cum_share"),
        F.round(cshare / cpop, 6).alias("cum_lift"),
    ).orderBy("decile")


_SQL_GAINS_CHART = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders GROUP BY 1
), base AS (
  SELECT NTILE(10) OVER (ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC,
                         c_custkey) AS decile,
         COALESCE(y, CAST(0 AS DECIMAL(18,2))) AS y
  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
), per_d AS (
  SELECT decile, COUNT(*) AS n, SUM(y) AS s FROM base GROUP BY 1
), cum AS (
  SELECT decile, n, s,
         SUM(s) OVER () AS st,
         SUM(s) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cs,
         SUM(n) OVER () AS nt,
         SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn
  FROM per_d
)
SELECT CAST(decile AS INT) AS decile,
       CAST(n AS BIGINT) AS n_customers,
       round(CAST(s AS DOUBLE) / CAST(st AS DOUBLE), 6) AS spend_share,
       round(CAST(cs AS DOUBLE) / CAST(st AS DOUBLE), 6) AS cum_share,
       round((CAST(cs AS DOUBLE) / CAST(st AS DOUBLE))
             / (CAST(cn AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS cum_lift
FROM cum
ORDER BY decile
"""


SESSION9_QUERIES.extend(
    [
        QueryDef(
            "q_kruskal_wallis", _q_kruskal_wallis, _SQL_KRUSKAL_WALLIS,
            "Kruskal-Wallis H with exact doubled ranks and tie correction",
        ),
        QueryDef(
            "q_mcnemar", _q_mcnemar, _SQL_MCNEMAR,
            "McNemar paired-proportions test",
        ),
        QueryDef(
            "q_gains_chart", _q_gains_chart, _SQL_GAINS_CHART,
            "cumulative gains / lift by score decile",
        ),
    ]
)
