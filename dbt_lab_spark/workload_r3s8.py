"""r3 session-8 additions: time-series causality (Granger), financial
risk (VaR / expected shortfall), hierarchical shrinkage (empirical
Bayes), price indexes (Laspeyres / Paasche / Fisher), and product
engagement (DAU/WAU stickiness).  Same (builder, oracle) contract as
dbt_lab_spark.workload.

Reference capability evidence: the reference's aggregate + join +
sort physical operators (qexec/PhysicalOperators*.java) and its
Hadoop bulk-operator extension point
(mapred/qexec/examples/CountTuplesOperator.java:36-67); each query
re-expresses one distributed shape a user of that surface would
build, Spark-first.

Determinism: integer/decimal moments end-to-end, frozen round-6
decimals wherever a rational would leak into accumulation, identical
double-formula parenthesization in both engines, deterministic ranks.
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
# Granger causality (lag-1): do views help predict purchases?
# ---------------------------------------------------------------------------


def _q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality test of daily view counts on daily
    purchase counts: fit y_t ~ y_{t-1} (restricted) and y_t ~ y_{t-1}
    + x_{t-1} (unrestricted) by OLS and compare with the F statistic
    ((RSS_r - RSS_u)/1) / (RSS_u/(n-3)) — the standard
    does-one-series-help-forecast-another test.  All ten moments are
    exact integers from ONE aggregate over the lagged day frame; the
    unrestricted normal equations solve by 3x3 Cramer determinants
    (the q_ridge pattern) and each RSS collapses algebraically to
    Syy - sum(coef_i * rhs_i) — no residual pass.  Scale: one events
    rollup + two lag windows + a 1-row moment reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("x"),
    )
    wd = Window.orderBy("day")
    lagged = daily.select(
        "y",
        F.lag("y").over(wd).alias("y1"),
        F.lag("x").over(wd).alias("x1"),
    ).filter(F.col("y1").isNotNull())
    mom = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("y1").alias("sy1"),
        F.sum("x1").alias("sx1"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * F.col("y1")).alias("syy1"),
        F.sum(F.col("y") * F.col("x1")).alias("syx1"),
        F.sum(F.col("y1") * F.col("y1")).alias("sy1y1"),
        F.sum(F.col("y1") * F.col("x1")).alias("sy1x1"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
    )
    nd = F.col("n").cast(_D)
    sy = F.col("sy").cast(_D)
    sy1 = F.col("sy1").cast(_D)
    sx1 = F.col("sx1").cast(_D)
    syy = F.col("syy").cast(_D)
    syy1 = F.col("syy1").cast(_D)
    syx1 = F.col("syx1").cast(_D)
    sy1y1 = F.col("sy1y1").cast(_D)
    sy1x1 = F.col("sy1x1").cast(_D)
    sx1x1 = F.col("sx1x1").cast(_D)
    # restricted: y ~ a + b*y1
    br = (nd * syy1 - sy1 * sy) / (nd * sy1y1 - sy1 * sy1)
    ar = (sy - br * sy1) / nd
    rss_r = syy - (ar * sy + br * syy1)
    # unrestricted: y ~ a + b*y1 + c*x1 via 3x3 Cramer
    det = (
        nd * (sy1y1 * sx1x1 - sy1x1 * sy1x1)
        - sy1 * (sy1 * sx1x1 - sy1x1 * sx1)
        + sx1 * (sy1 * sy1x1 - sy1y1 * sx1)
    )
    det_a = (
        sy * (sy1y1 * sx1x1 - sy1x1 * sy1x1)
        - sy1 * (syy1 * sx1x1 - sy1x1 * syx1)
        + sx1 * (syy1 * sy1x1 - sy1y1 * syx1)
    )
    det_b = (
        nd * (syy1 * sx1x1 - sy1x1 * syx1)
        - sy * (sy1 * sx1x1 - sy1x1 * sx1)
        + sx1 * (sy1 * syx1 - syy1 * sx1)
    )
    det_c = (
        nd * (sy1y1 * syx1 - syy1 * sy1x1)
        - sy1 * (sy1 * syx1 - syy1 * sx1)
        + sy * (sy1 * sy1x1 - sy1y1 * sx1)
    )
    au = det_a / det
    bu = det_b / det
    cu = det_c / det
    rss_u = syy - (au * sy + bu * syy1 + cu * syx1)
    fstat = (rss_r - rss_u) / (rss_u / (nd - 3.0))
    return mom.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(br, 6).alias("ar1_coef"),
        F.round(cu, 6).alias("x_lag_coef"),
        F.round(rss_r, 4).alias("rss_restricted"),
        F.round(rss_u, 4).alias("rss_unrestricted"),
        F.round(fstat, 6).alias("f_stat"),
    )


_SQL_GRANGER = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
), lagged AS (
  SELECT y, y1, x1 FROM (
    SELECT y, lag(y) OVER (ORDER BY day) AS y1, lag(x) OVER (ORDER BY day) AS x1
    FROM daily
  ) WHERE y1 IS NOT NULL
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y1) AS DOUBLE) AS sy1,
         CAST(SUM(x1) AS DOUBLE) AS sx1,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(y * y1) AS DOUBLE) AS syy1,
         CAST(SUM(y * x1) AS DOUBLE) AS syx1,
         CAST(SUM(y1 * y1) AS DOUBLE) AS sy1y1,
         CAST(SUM(y1 * x1) AS DOUBLE) AS sy1x1,
         CAST(SUM(x1 * x1) AS DOUBLE) AS sx1x1,
         COUNT(*) AS n_int
  FROM lagged
), fit AS (
  SELECT *,
         (n * syy1 - sy1 * sy) / (n * sy1y1 - sy1 * sy1) AS br,
         (n * (sy1y1 * sx1x1 - sy1x1 * sy1x1)
          - sy1 * (sy1 * sx1x1 - sy1x1 * sx1)
          + sx1 * (sy1 * sy1x1 - sy1y1 * sx1)) AS det,
         (sy * (sy1y1 * sx1x1 - sy1x1 * sy1x1)
          - sy1 * (syy1 * sx1x1 - sy1x1 * syx1)
          + sx1 * (syy1 * sy1x1 - sy1y1 * syx1)) AS det_a,
         (n * (syy1 * sx1x1 - sy1x1 * syx1)
          - sy * (sy1 * sx1x1 - sy1x1 * sx1)
          + sx1 * (sy1 * syx1 - syy1 * sx1)) AS det_b,
         (n * (sy1y1 * syx1 - syy1 * sy1x1)
          - sy1 * (sy1 * syx1 - syy1 * sx1)
          + sy * (sy1 * sy1x1 - sy1y1 * sx1)) AS det_c
  FROM mom
), rss AS (
  SELECT *,
         syy - (((sy - br * sy1) / n) * sy + br * syy1) AS rss_r,
         syy - ((det_a / det) * sy + (det_b / det) * syy1
                + (det_c / det) * syx1) AS rss_u
  FROM fit
)
SELECT CAST(n_int AS BIGINT) AS n_days,
       round(br, 6) AS ar1_coef,
       round(det_c / det, 6) AS x_lag_coef,
       round(rss_r, 4) AS rss_restricted,
       round(rss_u, 4) AS rss_unrestricted,
       round((rss_r - rss_u) / (rss_u / (n - 3.0)), 6) AS f_stat
FROM rss
"""


# ---------------------------------------------------------------------------
# Value-at-Risk and expected shortfall, exact discrete
# ---------------------------------------------------------------------------

_VAR_Q = 95


def _q_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk (exact discrete P95) and expected shortfall (mean
    of the worst 5% tail) of purchase values — the financial risk pair
    where ES needs PARTIAL counts at the cutoff: the tail is exactly
    the top n - rank95 observations, so copies of the cutoff value
    beyond rank95 enter the tail sum with multiplicity cum_cut -
    rank95.  Everything is exact integer cents on the compressed
    domain; ES is one division.  Scale: one hash aggregate + one
    cumulative window + one tail reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(F.col("event_type") == "purchase")
    per_v = ev.select((money("value") * 100).cast("long").alias("c")).groupBy(
        "c"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "c",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    rank = F.expr(f"({_VAR_Q} * n + 99) div 100")
    cut = cum.filter((rank > F.col("cum") - F.col("cnt")) & (rank <= F.col("cum"))).select(
        F.col("c").alias("cut"),
        F.col("cum").alias("cum_cut"),
        F.col("n").alias("n"),
        rank.alias("rank95"),
    )
    tail_above = (
        per_v.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("cut"))
        .agg(
            F.coalesce(F.sum(F.col("c") * F.col("cnt")), F.lit(0)).alias("s_above"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_above"),
        )
    )
    j = tail_above.crossJoin(F.broadcast(cut))
    bnd = F.col("cum_cut") - F.col("rank95")
    tail_n = F.col("n_above") + bnd
    tail_s = F.col("s_above") + F.col("cut") * bnd
    return j.select(
        F.col("n").cast("bigint").alias("n_obs"),
        (F.col("cut").cast(_D) / 100.0).alias("var95"),
        F.col("n_above").cast("bigint").alias("n_strictly_above"),
        tail_n.cast("bigint").alias("n_tail"),
        F.round(tail_s.cast(_D) / tail_n.cast(_D) / 100.0, 6).alias("es95"),
    )


_SQL_VAR_ES = f"""
WITH per_v AS MATERIALIZED (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c, COUNT(*) AS cnt
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), cum AS (
  SELECT c, cnt,
         SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS n
  FROM per_v
), cut AS (
  SELECT c AS cut, cum AS cum_cut, n, ({_VAR_Q} * n + 99) // 100 AS rank95
  FROM cum
  WHERE ({_VAR_Q} * n + 99) // 100 > cum - cnt AND ({_VAR_Q} * n + 99) // 100 <= cum
), tail_above AS (
  SELECT COALESCE(SUM(c * cnt), 0) AS s_above, COALESCE(SUM(cnt), 0) AS n_above
  FROM per_v CROSS JOIN cut WHERE c > cut
)
SELECT CAST(n AS BIGINT) AS n_obs,
       CAST(cut AS DOUBLE) / 100.0 AS var95,
       CAST(n_above AS BIGINT) AS n_strictly_above,
       CAST(n_above + (cum_cut - rank95) AS BIGINT) AS n_tail,
       round(CAST(s_above + cut * (cum_cut - rank95) AS DOUBLE)
             / CAST(n_above + (cum_cut - rank95) AS DOUBLE) / 100.0, 6) AS es95
FROM tail_above CROSS JOIN cut
"""


# ---------------------------------------------------------------------------
# empirical-Bayes (beta-binomial) shrinkage of per-nation rates
# ---------------------------------------------------------------------------


def _q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation urgent-order rates
    toward the portfolio prior: fit a beta prior by method of moments
    on the 25 raw rates (m, v -> alpha+beta = m(1-m)/v - 1), then
    report each nation's posterior-mean rate (k + alpha)/(n + alpha +
    beta) — the small-sample-stabilized leaderboard every marketplace
    runs.  Raw rates and their moments are frozen to round-6 decimals
    (order-free sums); alpha/beta are computed once and re-frozen, so
    the shrunken rates are identical double formulas.  Scale: one
    per-customer rollup, one 25-row rate frame, two tiny reduces."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey"])
    nation = scan(spark, cat, "nation", ["n_nationkey", "n_name"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("y")
    )
    per_nation = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("y", F.lit(0))).alias("k"),
        )
    )
    rates = per_nation.select(
        "c_nationkey",
        "n",
        "k",
        F.round(F.col("k").cast(_D) / F.col("n").cast(_D), 6)
        .cast("decimal(18,6)")
        .alias("r"),
    )
    prior = rates.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    )
    gd = F.col("g").cast(_D)
    m = F.col("sr").cast(_D) / gd
    v = (gd * F.col("srr").cast(_D) - F.col("sr").cast(_D) * F.col("sr").cast(_D)) / (
        gd * (gd - 1.0)
    )
    s = m * (1.0 - m) / v - 1.0
    pf = prior.select(
        F.round(m * s, 6).cast("decimal(18,6)").alias("alpha"),
        F.round((1.0 - m) * s, 6).cast("decimal(18,6)").alias("beta"),
        F.round(m, 6).alias("prior_mean"),
    )
    j = rates.crossJoin(F.broadcast(pf)).join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    shrunk = (F.col("k").cast(_D) + F.col("alpha").cast(_D)) / (
        F.col("n").cast(_D) + F.col("alpha").cast(_D) + F.col("beta").cast(_D)
    )
    return j.select(
        "n_name",
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("k").cast("bigint").alias("n_urgent"),
        F.col("r").cast(_D).alias("raw_rate"),
        F.round(shrunk, 6).alias("shrunk_rate"),
        F.col("prior_mean").alias("prior_mean"),
    ).orderBy("n_name")


_SQL_EB_SHRINKAGE = """
WITH urgent AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS y
  FROM orders GROUP BY 1
), per_nation AS (
  SELECT c_nationkey, COUNT(*) AS n, SUM(COALESCE(y, 0)) AS k
  FROM customer LEFT JOIN urgent ON c_custkey = o_custkey
  GROUP BY 1
), rates AS MATERIALIZED (
  SELECT c_nationkey, n, k,
         CAST(round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS r
  FROM per_nation
), prior AS MATERIALIZED (
  SELECT CAST(round((CAST(sr AS DOUBLE) / g)
                    * ((CAST(sr AS DOUBLE) / g) * (1.0 - CAST(sr AS DOUBLE) / g)
                       / ((g * CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
                           * CAST(sr AS DOUBLE)) / (g * (g - 1.0))) - 1.0), 6)
              AS DECIMAL(18,6)) AS alpha,
         CAST(round((1.0 - CAST(sr AS DOUBLE) / g)
                    * ((CAST(sr AS DOUBLE) / g) * (1.0 - CAST(sr AS DOUBLE) / g)
                       / ((g * CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
                           * CAST(sr AS DOUBLE)) / (g * (g - 1.0))) - 1.0), 6)
              AS DECIMAL(18,6)) AS beta,
         round(CAST(sr AS DOUBLE) / g, 6) AS prior_mean
  FROM (
    SELECT CAST(COUNT(*) AS DOUBLE) AS g, SUM(r) AS sr, SUM(r * r) AS srr
    FROM rates
  )
)
SELECT n_name,
       CAST(n AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS n_urgent,
       CAST(r AS DOUBLE) AS raw_rate,
       round((CAST(k AS DOUBLE) + CAST(alpha AS DOUBLE))
             / (CAST(n AS DOUBLE) + CAST(alpha AS DOUBLE)
                + CAST(beta AS DOUBLE)), 6) AS shrunk_rate,
       prior_mean
FROM rates CROSS JOIN prior
JOIN nation ON n_nationkey = c_nationkey
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indexes, 1996 -> 1997
# ---------------------------------------------------------------------------

_PI_Y0 = 1996
_PI_Y1 = 1997


def _q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indexes for 1997 vs the
    1996 base year over the parts traded in BOTH years: per-part unit
    prices are frozen round-6 decimals (sum extprice / sum qty per
    part-year), quantities are exact integers, so all four cross
    baskets (p0q0, p1q0, p0q1, p1q1) are exact decimal sums and each
    index is one double division (Fisher = sqrt of the product) —
    the canonical inflation arithmetic.  Scale: one lineitem+orders
    aggregate to the part-year grain + one part-keyed join."""
    cat = Catalog(sf_dir)
    li = scan(
        spark, cat, "lineitem", ["l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"]
    )
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_orderdate"])
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_partkey",
            F.year("o_orderdate").alias("yr"),
            money("l_extendedprice").alias("s"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .filter(F.col("yr").isin(_PI_Y0, _PI_Y1))
    )
    per_py = base.groupBy("l_partkey", "yr").agg(
        F.sum("s").alias("s"), F.sum("q").alias("q")
    ).select(
        "l_partkey",
        "yr",
        "q",
        F.round(F.col("s").cast(_D) / F.col("q").cast(_D), 6)
        .cast("decimal(18,6)")
        .alias("p"),
    )
    y0 = per_py.filter(F.col("yr") == _PI_Y0).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    y1 = per_py.filter(F.col("yr") == _PI_Y1).select(
        F.col("l_partkey").alias("pk1"), F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    both = y0.join(y1, y0.l_partkey == y1.pk1)
    baskets = both.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p0") * F.col("q0")).alias("p0q0"),
        F.sum(F.col("p1") * F.col("q0")).alias("p1q0"),
        F.sum(F.col("p0") * F.col("q1")).alias("p0q1"),
        F.sum(F.col("p1") * F.col("q1")).alias("p1q1"),
    )
    lasp = F.col("p1q0").cast(_D) / F.col("p0q0").cast(_D)
    paas = F.col("p1q1").cast(_D) / F.col("p0q1").cast(_D)
    return baskets.select(
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


_SQL_PRICE_INDEX = f"""
WITH base AS (
  SELECT l_partkey, year(o_orderdate) AS yr,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS s,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) IN ({_PI_Y0}, {_PI_Y1})
), per_py AS (
  SELECT l_partkey, yr, SUM(q) AS q,
         CAST(round(CAST(SUM(s) AS DOUBLE) / CAST(SUM(q) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS p
  FROM base GROUP BY 1, 2
), both_y AS (
  SELECT y0.l_partkey, y0.p AS p0, y0.q AS q0, y1.p AS p1, y1.q AS q1
  FROM (SELECT * FROM per_py WHERE yr = {_PI_Y0}) y0
  JOIN (SELECT * FROM per_py WHERE yr = {_PI_Y1}) y1 USING (l_partkey)
), baskets AS (
  SELECT COUNT(*) AS n_parts,
         SUM(p0 * q0) AS p0q0, SUM(p1 * q0) AS p1q0,
         SUM(p0 * q1) AS p0q1, SUM(p1 * q1) AS p1q1
  FROM both_y
)
SELECT CAST(n_parts AS BIGINT) AS n_parts,
       round(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE), 6) AS laspeyres,
       round(CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE), 6) AS paasche,
       round(sqrt((CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE))
                  * (CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE))), 6) AS fisher
FROM baskets
"""


# ---------------------------------------------------------------------------
# DAU / WAU stickiness
# ---------------------------------------------------------------------------


def _q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the product
    engagement ratio (how many of this week's actives showed up
    today).  Distinct (day, user) pairs FIRST (the compression), then
    a 7-day band join re-counts distinct users per window end; both
    counts are exact integers and stickiness is one division.  Days
    with under 7 days of history are reported with their partial
    window (window_days says how many).  Scale: one distinct
    aggregate + a 7-wide band join on the day grain."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    du = ev.distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = dau.select(F.col("day").alias("d"))
    wau = (
        days.join(
            du,
            (F.col("day") <= F.col("d"))
            & (F.col("day") >= F.date_sub(F.col("d"), 6)),
        )
        .groupBy("d")
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.countDistinct("day").alias("window_days"),
        )
    )
    return (
        dau.join(wau, dau.day == wau.d)
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.col("window_days").cast("int").alias("window_days"),
            F.round(F.col("dau").cast(_D) / F.col("wau").cast(_D), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


_SQL_DAU_WAU = """
WITH du AS MATERIALIZED (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM du GROUP BY 1
), wau AS (
  SELECT d.day AS d, COUNT(DISTINCT du.user_id) AS wau,
         COUNT(DISTINCT du.day) AS window_days
  FROM (SELECT DISTINCT day FROM du) d
  JOIN du ON du.day <= d.day AND du.day >= d.day - INTERVAL 6 DAY
  GROUP BY 1
)
SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(window_days AS INT) AS window_days,
       round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau ON wau.d = dau.day
ORDER BY dau.day
"""


SESSION8_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_granger", _q_granger, _SQL_GRANGER,
        "lag-1 Granger causality (Cramer-solved nested OLS)",
    ),
    QueryDef(
        "q_var_es", _q_var_es, _SQL_VAR_ES,
        "VaR95 + expected shortfall with exact boundary multiplicity",
    ),
    QueryDef(
        "q_eb_shrinkage", _q_eb_shrinkage, _SQL_EB_SHRINKAGE,
        "empirical-Bayes beta-binomial rate shrinkage",
    ),
    QueryDef(
        "q_price_index", _q_price_index, _SQL_PRICE_INDEX,
        "Laspeyres/Paasche/Fisher price indexes",
    ),
    QueryDef(
        "q_dau_wau", _q_dau_wau, _SQL_DAU_WAU,
        "DAU/WAU stickiness over a 7-day band join",
    ),
]


# ---------------------------------------------------------------------------
# grid-DBSCAN density classification (core / border / noise)
# ---------------------------------------------------------------------------

_DB_EPS = 1.5
_DB_MINPTS = 4
_DB_SPAN = 100.0


def _db_u(key: F.Column, salt: str) -> F.Column:
    """md5-uniform in [0,1) — the engine's no-RNG convention (the
    q_geo_nearest generator on a planar [0,100)^2 space)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15), 16, 10
        ).cast("double")
        / F.pow(F.lit(2.0), F.lit(60))
    )


def _q_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density classification of customers on the deterministic
    md5 plane: core (>= 4 points within eps=1.5, self included),
    border (non-core with a core neighbor), noise — the density
    clustering primitive, done the scalable way: grid cells of size
    eps so candidates come from a 3x3 CELL EQUI-JOIN (x9 replication),
    never an all-pairs distance join; the eps test compares the
    ROUND-6 squared distance so a last-ulp difference cannot flip
    membership (the q_geo_nearest trick).  Output: per-class point
    counts and exact mean neighbor counts.  Scale: the cell id is the
    shuffle key; density per cell bounds the fan-in."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey"]).select(
        "c_custkey",
        (_db_u(F.col("c_custkey"), "dbx") * _DB_SPAN).alias("x"),
        (_db_u(F.col("c_custkey"), "dby") * _DB_SPAN).alias("y"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    probe = cust.select(
        F.col("c_custkey").alias("p"),
        "x",
        "y",
        F.explode(offs).alias("o"),
    ).select(
        "p",
        "x",
        "y",
        (
            (F.floor(F.col("x") / _DB_EPS) + F.col("o.dx")) * 1000
            + (F.floor(F.col("y") / _DB_EPS) + F.col("o.dy"))
        ).alias("cell"),
    )
    build = cust.select(
        F.col("c_custkey").alias("q"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        (
            F.floor(F.col("x") / _DB_EPS) * 1000 + F.floor(F.col("y") / _DB_EPS)
        ).alias("cell"),
    )
    d2 = F.round(
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy")),
        6,
    )
    pairs = (
        probe.join(build, "cell")
        .filter(d2 <= F.lit(_DB_EPS * _DB_EPS))
        .select("p", "q")
    )
    ncount = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("nn"))
    flags = ncount.select(
        "p", "nn", (F.col("nn") >= _DB_MINPTS).alias("is_core")
    )
    cores = flags.filter(F.col("is_core")).select(F.col("p").alias("q"))
    has_core_nb = (
        pairs.join(cores, "q").select("p").distinct().withColumn("near_core", F.lit(True))
    )
    classed = (
        flags.join(has_core_nb, "p", "left")
        .select(
            "nn",
            F.when(F.col("is_core"), "core")
            .when(F.coalesce("near_core", F.lit(False)), "border")
            .otherwise("noise")
            .alias("cls"),
        )
    )
    return (
        classed.groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("nn").alias("snn"),
        )
        .select(
            "cls",
            F.col("n_points").cast("bigint").alias("n_points"),
            F.round(F.col("snn").cast(_D) / F.col("n_points").cast(_D), 6).alias(
                "mean_neighbors"
            ),
        )
        .orderBy("cls")
    )


_SQL_DBSCAN_CORE = f"""
WITH cust AS MATERIALIZED (
  SELECT c_custkey,
         CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR) || 'dbx'), 1, 15))
              AS BIGINT) / power(2.0, 60) * {_DB_SPAN} AS x,
         CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR) || 'dby'), 1, 15))
              AS BIGINT) / power(2.0, 60) * {_DB_SPAN} AS y
  FROM customer
), probe AS (
  SELECT c_custkey AS p, x, y,
         (floor(x / {_DB_EPS}) + o.dx) * 1000 + (floor(y / {_DB_EPS}) + o.dy) AS cell
  FROM cust CROSS JOIN (
    SELECT dx, dy FROM (VALUES (-1),(0),(1)) a(dx), (VALUES (-1),(0),(1)) b(dy)
  ) o
), build AS (
  SELECT c_custkey AS q, x AS qx, y AS qy,
         floor(x / {_DB_EPS}) * 1000 + floor(y / {_DB_EPS}) AS cell
  FROM cust
), pairs AS MATERIALIZED (
  SELECT p, q FROM probe JOIN build USING (cell)
  WHERE round((x - qx) * (x - qx) + (y - qy) * (y - qy), 6)
        <= {_DB_EPS * _DB_EPS}
), flags AS MATERIALIZED (
  SELECT p, COUNT(*) AS nn, COUNT(*) >= {_DB_MINPTS} AS is_core
  FROM pairs GROUP BY 1
), has_core_nb AS (
  SELECT DISTINCT pr.p FROM pairs pr
  JOIN flags f ON f.p = pr.q AND f.is_core
)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_points,
       round(CAST(SUM(nn) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_neighbors
FROM (
  SELECT f.nn,
         CASE WHEN f.is_core THEN 'core'
              WHEN h.p IS NOT NULL THEN 'border'
              ELSE 'noise' END AS cls
  FROM flags f LEFT JOIN has_core_nb h ON h.p = f.p
)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# sample-ratio mismatch check
# ---------------------------------------------------------------------------


def _q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check on the md5 A/B split of customers:
    chi-square of the observed arm counts against the designed 50/50 —
    the first health check every experimentation platform runs before
    reading any metric.  Counts exact; the statistic is one double
    formula; the flag compares against the frozen 5% critical value
    3.841459.  Scale: one 2-cell aggregate."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey"])
    agg = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("srm"))),
                    1,
                    1,
                ).isin(*list("01234567")),
                1,
            ).otherwise(0)
        ).alias("na"),
    )
    nd = F.col("n").cast(_D)
    nad = F.col("na").cast(_D)
    nbd = nd - nad
    e = nd / 2.0
    chi2 = (nad - e) * (nad - e) / e + (nbd - e) * (nbd - e) / e
    return agg.select(
        F.col("n").cast("bigint").alias("n_units"),
        F.col("na").cast("bigint").alias("n_a"),
        (F.col("n") - F.col("na")).cast("bigint").alias("n_b"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_flag"),
    )


_SQL_SRM_CHECK = """
WITH agg AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR) || 'srm'), 1, 1)
                  BETWEEN '0' AND '7' THEN 1 ELSE 0 END) AS na
  FROM customer
)
SELECT CAST(n AS BIGINT) AS n_units, CAST(na AS BIGINT) AS n_a,
       CAST(n - na AS BIGINT) AS n_b,
       round((CAST(na AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * (CAST(na AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             / (CAST(n AS DOUBLE) / 2.0)
             + ((CAST(n AS DOUBLE) - CAST(na AS DOUBLE))
                - CAST(n AS DOUBLE) / 2.0)
               * ((CAST(n AS DOUBLE) - CAST(na AS DOUBLE))
                  - CAST(n AS DOUBLE) / 2.0)
               / (CAST(n AS DOUBLE) / 2.0), 6) AS chi2,
       ((CAST(na AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
        * (CAST(na AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
        / (CAST(n AS DOUBLE) / 2.0)
        + ((CAST(n AS DOUBLE) - CAST(na AS DOUBLE)) - CAST(n AS DOUBLE) / 2.0)
          * ((CAST(n AS DOUBLE) - CAST(na AS DOUBLE)) - CAST(n AS DOUBLE) / 2.0)
          / (CAST(n AS DOUBLE) / 2.0)) > 3.841459 AS srm_flag
FROM agg
"""


# ---------------------------------------------------------------------------
# directed-graph summary statistics
# ---------------------------------------------------------------------------


def _q_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary statistics of the directed top-3 trade graph:
    reciprocity (share of edges whose reverse also exists, via one
    self-join), density e/(n(n-1)), and exact out-degree mean/max —
    the one-row graph health card next to the per-node centrality
    queries.  All counts exact integers; three double divisions.
    Scale: the edge frame is the trade-edge extraction; everything
    after is O(|edges|)."""
    from dbt_lab_spark.workload_extras import _trade_edges_topk

    edges = _trade_edges_topk(spark, sf_dir)
    rev = edges.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
    recip = edges.join(rev, ["src", "dst"]).agg(F.count(F.lit(1)).alias("r"))
    nodes = (
        edges.select(F.col("src").alias("u"))
        .unionAll(edges.select(F.col("dst").alias("u")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("nn"))
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    dstats = outd.agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("od").alias("ne"),
        F.max("od").alias("max_od"),
    )
    j = dstats.crossJoin(F.broadcast(recip)).crossJoin(F.broadcast(nodes))
    nnd = F.col("nn").cast(_D)
    return j.select(
        F.col("nn").cast("int").alias("n_nodes"),
        F.col("ne").cast("bigint").alias("n_edges"),
        F.round(F.col("r").cast(_D) / F.col("ne").cast(_D), 6).alias("reciprocity"),
        F.round(F.col("ne").cast(_D) / (nnd * (nnd - 1.0)), 6).alias("density"),
        F.round(F.col("ne").cast(_D) / F.col("n_src").cast(_D), 6).alias(
            "mean_out_degree"
        ),
        F.col("max_od").cast("int").alias("max_out_degree"),
    )


def _sql_graph_stats() -> str:
    from dbt_lab_spark.workload_extras import _SQL_TRADE_EDGES

    return f"""
WITH {_SQL_TRADE_EDGES},
recip AS (
  SELECT COUNT(*) AS r FROM edges e
  JOIN edges x ON x.src = e.dst AND x.dst = e.src
), nodes AS (
  SELECT COUNT(*) AS nn FROM (
    SELECT DISTINCT u FROM (
      SELECT src AS u FROM edges UNION ALL SELECT dst FROM edges))
), dstats AS (
  SELECT COUNT(*) AS n_src, SUM(od) AS ne, MAX(od) AS max_od FROM (
    SELECT src, COUNT(*) AS od FROM edges GROUP BY 1)
)
SELECT CAST(nn AS INT) AS n_nodes, CAST(ne AS BIGINT) AS n_edges,
       round(CAST(r AS DOUBLE) / CAST(ne AS DOUBLE), 6) AS reciprocity,
       round(CAST(ne AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 6)
         AS density,
       round(CAST(ne AS DOUBLE) / CAST(n_src AS DOUBLE), 6) AS mean_out_degree,
       CAST(max_od AS INT) AS max_out_degree
FROM dstats CROSS JOIN recip CROSS JOIN nodes
"""


# ---------------------------------------------------------------------------
# exact higher moments: skewness and excess kurtosis per event type
# ---------------------------------------------------------------------------


def _q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of event values per
    type from EXACT raw power sums: S1..S4 in integer cents, with the
    3rd/4th powers accumulated in DECIMAL(38,0)/HUGEINT (a single c^4
    already overflows int64) — the shape diagnostics beyond
    q_stats_agg's mean/std.  Central moments expand algebraically
    from the raw sums in identically-parenthesized doubles; the two
    shape statistics are scale-invariant so cents need no
    normalization.  Scale: ONE hash aggregate."""
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
    m3 = F.col("s3").cast(_D) / nd - 3.0 * m * (F.col("s2").cast(_D) / nd) + 2.0 * m * m * m
    m4 = (
        F.col("s4").cast(_D) / nd
        - 4.0 * m * (F.col("s3").cast(_D) / nd)
        + 6.0 * m * m * (F.col("s2").cast(_D) / nd)
        - 3.0 * m * m * m * m
    )
    return mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(m / 100.0, 6).alias("mean_value"),
        F.round(m3 / F.sqrt(m2 * m2 * m2), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    ).orderBy("event_type")


_SQL_HIGHER_MOMENTS = """
WITH mom AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2,
         SUM(CAST(c * c AS HUGEINT) * c) AS s3,
         SUM(CAST(c * c AS HUGEINT) * c * c) AS s4
  FROM (
    SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events
  ) GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_value,
       round((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
              - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
         AS skewness,
       round((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
              - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
              + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                   - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))) - 3.0, 6)
         AS excess_kurtosis
FROM mom
ORDER BY event_type
"""


SESSION8_QUERIES.extend(
    [
        QueryDef(
            "q_dbscan_core", _q_dbscan_core, _SQL_DBSCAN_CORE,
            "grid-DBSCAN core/border/noise classification",
        ),
        QueryDef(
            "q_srm_check", _q_srm_check, _SQL_SRM_CHECK,
            "sample-ratio-mismatch chi-square check",
        ),
        QueryDef(
            "q_graph_stats", _q_graph_stats, _sql_graph_stats(),
            "directed-graph health card (reciprocity, density, degrees)",
        ),
        QueryDef(
            "q_higher_moments", _q_higher_moments, _SQL_HIGHER_MOMENTS,
            "exact skewness / excess kurtosis from raw power sums",
        ),
    ]
)


# ---------------------------------------------------------------------------
# ECOD-style tail-probability outliers (2-D, exact ECDF)
# ---------------------------------------------------------------------------

_ECOD_TOPK = 10


def _q_ecod_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECOD-style outlier scoring of customers on (acctbal, order
    count): per dimension, the exact two-sided empirical tail
    probability min(P(X <= x), P(X >= x)) from tie-inclusive RANGE-
    frame counts; the score sums the frozen round-6 -ln tails across
    dimensions (the parameter-free ECDF outlier detector, simplified
    to the two-sided variant).  Tail counts are exact integers; the
    per-dim ln is frozen to DECIMAL so the 2-term score sum is exact;
    top-10 with (score desc, custkey) determinism.  Scale: two
    RANGE-frame windows per dimension + a top-k."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey"])
    cnts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("k"))
    base = cust.join(cnts, cust.c_custkey == cnts.o_custkey, "left").select(
        "c_custkey",
        (money("c_acctbal") * 100).cast("long").alias("x1"),
        F.coalesce("k", F.lit(0)).cast("long").alias("x2"),
    )
    wall = Window.partitionBy()

    def dim_score(col: str) -> F.Column:
        wl = Window.orderBy(col).rangeBetween(Window.unboundedPreceding, 0)
        wr = Window.orderBy(F.col(col).desc()).rangeBetween(
            Window.unboundedPreceding, 0
        )
        le = F.count(F.lit(1)).over(wl)
        ge = F.count(F.lit(1)).over(wr)
        n = F.count(F.lit(1)).over(wall)
        tail = F.least(le, ge).cast(_D) / n.cast(_D)
        return F.round(-F.log(tail), 6).cast("decimal(18,6)")

    scored = base.select(
        "c_custkey",
        "x1",
        "x2",
        (dim_score("x1") + dim_score("x2")).alias("score"),
    )
    top = scored.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("score"), "c_custkey"))
    ).filter(F.col("rn") <= _ECOD_TOPK)
    return top.select(
        "c_custkey",
        (F.col("x1").cast(_D) / 100.0).alias("acctbal"),
        F.col("x2").cast("bigint").alias("n_orders"),
        F.col("score").cast(_D).alias("ecod_score"),
        F.col("rn").cast("int").alias("rank"),
    ).orderBy("rank")


_SQL_ECOD_OUTLIERS = f"""
WITH cnts AS (
  SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1
), base AS (
  SELECT c_custkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x1,
         CAST(COALESCE(k, 0) AS BIGINT) AS x2
  FROM customer LEFT JOIN cnts ON c_custkey = o_custkey
), scored AS (
  SELECT c_custkey, x1, x2,
         CAST(round(-ln(CAST(least(
             COUNT(*) OVER (ORDER BY x1 RANGE UNBOUNDED PRECEDING),
             COUNT(*) OVER (ORDER BY x1 DESC RANGE UNBOUNDED PRECEDING))
           AS DOUBLE) / CAST(COUNT(*) OVER () AS DOUBLE)), 6) AS DECIMAL(18,6))
         + CAST(round(-ln(CAST(least(
             COUNT(*) OVER (ORDER BY x2 RANGE UNBOUNDED PRECEDING),
             COUNT(*) OVER (ORDER BY x2 DESC RANGE UNBOUNDED PRECEDING))
           AS DOUBLE) / CAST(COUNT(*) OVER () AS DOUBLE)), 6) AS DECIMAL(18,6))
         AS score
  FROM base
)
SELECT c_custkey,
       CAST(x1 AS DOUBLE) / 100.0 AS acctbal,
       x2 AS n_orders,
       CAST(score AS DOUBLE) AS ecod_score,
       CAST(rn AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, c_custkey) AS rn FROM scored
) WHERE rn <= {_ECOD_TOPK}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Shapley decomposition of R^2 over two features
# ---------------------------------------------------------------------------


def _q_shapley_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley decomposition of regression R^2 between two
    features (acctbal, order count) predicting per-customer total
    spend: with v(S) = R^2 of the OLS on subset S, phi_i =
    ((v({i}) - v(0)) + (v(both) - v({j}))) / 2 — model explainability
    with the EXACT game-theoretic attribution (2 features = closed
    form, no sampling).  All v(S) values derive from one 9-moment
    integer-cent aggregate: single-feature R^2 is the squared
    correlation; the two-feature R^2 solves the 3x3 normal equations
    by Cramer and collapses RSS algebraically (the q_granger
    machinery).  Scale: one rollup + one moment reduce."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(money("o_totalprice")) * 100).cast("long").alias("y"),
        F.count(F.lit(1)).alias("k"),
    )
    base = cust.join(spend, cust.c_custkey == spend.o_custkey, "left").select(
        (money("c_acctbal") * 100).cast("long").alias("a"),
        F.coalesce("k", F.lit(0)).cast("long").alias("b"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum("y").alias("sy"),
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias("sab"),
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("y")).alias("say"),
        F.sum(F.col("b").cast("decimal(38,0)") * F.col("y")).alias("sby"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast(_D)
    sa, sb, sy = (F.col(c).cast(_D) for c in ("sa", "sb", "sy"))
    saa, sbb, sab = (F.col(c).cast(_D) for c in ("saa", "sbb", "sab"))
    say, sby, syy = (F.col(c).cast(_D) for c in ("say", "sby", "syy"))
    cay = nd * say - sa * sy
    cby = nd * sby - sb * sy
    vaa = nd * saa - sa * sa
    vbb = nd * sbb - sb * sb
    vab = nd * sab - sa * sb
    vyy = nd * syy - sy * sy
    r2_a = cay * cay / (vaa * vyy)
    r2_b = cby * cby / (vbb * vyy)
    # two-feature R^2 from the centered 2x2 normal equations
    det = vaa * vbb - vab * vab
    beta_a = (cay * vbb - cby * vab) / det
    beta_b = (cby * vaa - cay * vab) / det
    r2_full = (beta_a * cay + beta_b * cby) / vyy
    shap_a = ((r2_a - 0.0) + (r2_full - r2_b)) / 2.0
    shap_b = ((r2_b - 0.0) + (r2_full - r2_a)) / 2.0
    return mom.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(r2_a, 6).alias("r2_acctbal"),
        F.round(r2_b, 6).alias("r2_orders"),
        F.round(r2_full, 6).alias("r2_full"),
        F.round(shap_a, 6).alias("shapley_acctbal"),
        F.round(shap_b, 6).alias("shapley_orders"),
    )


_SQL_SHAPLEY_R2 = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
         COUNT(*) AS k
  FROM orders GROUP BY 1
), base AS (
  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS a,
         CAST(COALESCE(k, 0) AS BIGINT) AS b,
         COALESCE(y, 0) AS y
  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_int,
         CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(b) AS DOUBLE) AS sb,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS saa,
         CAST(SUM(b * b) AS DOUBLE) AS sbb,
         CAST(SUM(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sab,
         CAST(SUM(CAST(a AS HUGEINT) * y) AS DOUBLE) AS say,
         CAST(SUM(CAST(b AS HUGEINT) * y) AS DOUBLE) AS sby,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM base
), c AS (
  SELECT n_int,
         n * say - sa * sy AS cay, n * sby - sb * sy AS cby,
         n * saa - sa * sa AS vaa, n * sbb - sb * sb AS vbb,
         n * sab - sa * sb AS vab, n * syy - sy * sy AS vyy
  FROM mom
), fit AS (
  SELECT *,
         cay * cay / (vaa * vyy) AS r2_a,
         cby * cby / (vbb * vyy) AS r2_b,
         ((cay * vbb - cby * vab) / (vaa * vbb - vab * vab) * cay
          + (cby * vaa - cay * vab) / (vaa * vbb - vab * vab) * cby) / vyy AS r2_full
  FROM c
)
SELECT CAST(n_int AS BIGINT) AS n_customers,
       round(r2_a, 6) AS r2_acctbal,
       round(r2_b, 6) AS r2_orders,
       round(r2_full, 6) AS r2_full,
       round(((r2_a - 0.0) + (r2_full - r2_b)) / 2.0, 6) AS shapley_acctbal,
       round(((r2_b - 0.0) + (r2_full - r2_a)) / 2.0, 6) AS shapley_orders
FROM fit
"""


# ---------------------------------------------------------------------------
# delta-method CI for a ratio-of-means metric
# ---------------------------------------------------------------------------


def _q_ratio_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for the ratio metric
    'purchase value per view' with the USER as the randomization unit:
    R = sum(x_u)/sum(y_u), var(R) ~= (s_xx - 2R s_xy + R^2 s_yy) /
    (n ybar^2) — the correct CI for ratio metrics (a naive per-event
    mean ignores user-level correlation).  Per-user x (purchase
    cents) and y (view count) are exact integers; the five moments
    come from one aggregate; R, the SE, and the frozen-z CI are
    identically-parenthesized doubles.  Scale: one per-user aggregate
    + a 1-row reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        (
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", money("value"))),
                F.lit(0),
            )
            * 100
        )
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("y"),
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast(_D)
    sx, sy = F.col("sx").cast(_D), F.col("sy").cast(_D)
    sxx, sxy, syy = (F.col(c).cast(_D) for c in ("sxx", "sxy", "syy"))
    r = sx / sy
    vxx = (nd * sxx - sx * sx) / (nd * (nd - 1.0))
    vxy = (nd * sxy - sx * sy) / (nd * (nd - 1.0))
    vyy = (nd * syy - sy * sy) / (nd * (nd - 1.0))
    ybar = sy / nd
    se = F.sqrt((vxx - 2.0 * r * vxy + r * r * vyy) / nd) / ybar
    z = 1.959964
    return mom.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(r / 100.0, 6).alias("ratio"),
        F.round(se / 100.0, 6).alias("se"),
        F.round((r - z * se) / 100.0, 6).alias("ci_lo"),
        F.round((r + z * se) / 100.0, 6).alias("ci_hi"),
    )


_SQL_RATIO_DELTA = """
WITH per_user AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100
              AS BIGINT) AS x,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_int,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM per_user
), fit AS (
  SELECT n_int, n, sx / sy AS r, sy / n AS ybar,
         (n * sxx - sx * sx) / (n * (n - 1.0)) AS vxx,
         (n * sxy - sx * sy) / (n * (n - 1.0)) AS vxy,
         (n * syy - sy * sy) / (n * (n - 1.0)) AS vyy
  FROM mom
), res AS (
  SELECT n_int, r,
         sqrt((vxx - 2.0 * r * vxy + r * r * vyy) / n) / ybar AS se
  FROM fit
)
SELECT CAST(n_int AS BIGINT) AS n_users,
       round(r / 100.0, 6) AS ratio,
       round(se / 100.0, 6) AS se,
       round((r - 1.959964 * se) / 100.0, 6) AS ci_lo,
       round((r + 1.959964 * se) / 100.0, 6) AS ci_hi
FROM res
"""


SESSION8_QUERIES.extend(
    [
        QueryDef(
            "q_ecod_outliers", _q_ecod_outliers, _SQL_ECOD_OUTLIERS,
            "ECOD-style exact-ECDF tail outliers, top-10",
        ),
        QueryDef(
            "q_shapley_r2", _q_shapley_r2, _SQL_SHAPLEY_R2,
            "exact Shapley decomposition of 2-feature R^2",
        ),
        QueryDef(
            "q_ratio_delta", _q_ratio_delta, _SQL_RATIO_DELTA,
            "delta-method CI for a ratio-of-means metric",
        ),
    ]
)


# ---------------------------------------------------------------------------
# rolling 7-day regression beta (windowed moments)
# ---------------------------------------------------------------------------

_RB_WIN = 7


def _q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day regression slope of daily purchase value on daily
    view count: per day, the OLS beta over the trailing window from
    WINDOWED exact integer moments (sum, sum-of-products over a ROWS
    frame) — rolling regression without per-window refits, the
    streaming-friendly way.  Each day's beta and correlation are
    identically-parenthesized doubles over window sums.  Scale: one
    daily rollup + one 4-sum ROWS window."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("x"),
        (
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", money("value"))),
                F.lit(0),
            )
            * 100
        )
        .cast("long")
        .alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-(_RB_WIN - 1), Window.currentRow)
    mom = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).over(w).alias("syy"),
    ).filter(F.col("n") == _RB_WIN)
    nd = F.col("n").cast(_D)
    cov = nd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)
    vx = nd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    vy = nd * F.col("syy").cast(_D) - F.col("sy").cast(_D) * F.col("sy").cast(_D)
    return mom.select(
        "day",
        F.col("n").cast("int").alias("window_n"),
        F.round(cov / vx / 100.0, 6).alias("beta"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr"),
    ).orderBy("day")


_SQL_ROLLING_BETA = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100
              AS BIGINT) AS y
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
), mom AS (
  SELECT day,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx,
         SUM(CAST(y AS HUGEINT) * y) OVER w AS syy
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {_RB_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(n AS INT) AS window_n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6) AS beta,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
FROM mom WHERE n = {_RB_WIN}
ORDER BY day
"""


# ---------------------------------------------------------------------------
# partial correlation controlling for a confounder
# ---------------------------------------------------------------------------


def _q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of customer acctbal and total spend
    CONTROLLING for order count: r_xy.z = (r_xy - r_xz r_zy) /
    sqrt((1 - r_xz^2)(1 - r_zy^2)) — does balance relate to spend
    beyond the mechanical does-more-orders channel?  The three raw
    correlations come from one 9-moment integer-cent aggregate (the
    q_shapley_r2 frame); the partial is one double formula.  Scale:
    one rollup + a 1-row reduce."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(money("o_totalprice")) * 100).cast("long").alias("y"),
        F.count(F.lit(1)).alias("k"),
    )
    base = cust.join(spend, cust.c_custkey == spend.o_custkey, "left").select(
        (money("c_acctbal") * 100).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
        F.coalesce("k", F.lit(0)).cast("long").alias("z"),
    )
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("z")).alias("sxz"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("z")).alias("syz"),
    )
    nd = F.col("n").cast(_D)

    def corr(sab, sa, sb, saa, sbb):
        num = nd * F.col(sab).cast(_D) - F.col(sa).cast(_D) * F.col(sb).cast(_D)
        da = nd * F.col(saa).cast(_D) - F.col(sa).cast(_D) * F.col(sa).cast(_D)
        db = nd * F.col(sbb).cast(_D) - F.col(sb).cast(_D) * F.col(sb).cast(_D)
        return num / F.sqrt(da * db)

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    rzy = corr("syz", "sy", "sz", "syy", "szz")
    partial = (rxy - rxz * rzy) / F.sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy))
    return mom.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(rxy, 6).alias("r_bal_spend"),
        F.round(rxz, 6).alias("r_bal_orders"),
        F.round(rzy, 6).alias("r_spend_orders"),
        F.round(partial, 6).alias("partial_r"),
    )


_SQL_PARTIAL_CORR = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
         COUNT(*) AS k
  FROM orders GROUP BY 1
), base AS (
  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         COALESCE(y, 0) AS y, CAST(COALESCE(k, 0) AS BIGINT) AS z
  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
), mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_int,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(z) AS DOUBLE) AS sz,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
         CAST(SUM(z * z) AS DOUBLE) AS szz,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz,
         CAST(SUM(CAST(y AS HUGEINT) * z) AS DOUBLE) AS syz
  FROM base
), cors AS (
  SELECT n_int,
         (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
         (n * sxz - sx * sz) / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
         (n * syz - sy * sz) / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS rzy
  FROM mom
)
SELECT CAST(n_int AS BIGINT) AS n_customers,
       round(rxy, 6) AS r_bal_spend,
       round(rxz, 6) AS r_bal_orders,
       round(rzy, 6) AS r_spend_orders,
       round((rxy - rxz * rzy) / sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy)), 6)
         AS partial_r
FROM cors
"""


# ---------------------------------------------------------------------------
# Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------

_BD_TOPK = 30


def _q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between document sources: for the top-30 corpus
    tokens, z-score each source's relative frequency across sources
    and report the mean |z1 - z2| per source pair — the classic
    stylometric authorship distance, distributed: one token explode,
    two tiny aggregates, one pair join on the 30-token frame.
    Relative frequencies are frozen to round-9 DECIMALS (they live at
    1e-3 scale), z-scores re-freeze to round-6, so the per-pair mean
    is an exact decimal sum over 30 terms with one final division.
    Scale: the explode+count is the q_word_count shape; everything
    after runs on |sources| x 30 rows."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["source", "text"])
    toks = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
        )
        .filter(F.col("rk") <= _BD_TOPK)
        .select("token")
    )
    per_src_tok = (
        toks.join(F.broadcast(top), "token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    src_tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
    srcs = src_tot.select("source")
    dense = (
        srcs.crossJoin(top)
        .join(per_src_tok, ["source", "token"], "left")
        .join(src_tot, "source")
        .select(
            "source",
            "token",
            F.round(
                F.coalesce("c", F.lit(0)).cast(_D) / F.col("tot").cast(_D), 9
            )
            .cast("decimal(18,9)")
            .alias("f"),
        )
    )
    wt = Window.partitionBy("token")
    stats = dense.select(
        "source",
        "token",
        "f",
        F.count(F.lit(1)).over(wt).alias("ns"),
        F.sum("f").over(wt).alias("sf"),
        F.sum(F.col("f") * F.col("f")).over(wt).alias("sff"),
    )
    nsd = F.col("ns").cast(_D)
    mean = F.col("sf").cast(_D) / nsd
    std = F.sqrt(
        (nsd * F.col("sff").cast(_D) - F.col("sf").cast(_D) * F.col("sf").cast(_D))
        / (nsd * (nsd - 1.0))
    )
    z = dense.join(
        stats.select("source", "token", "ns", "sf", "sff"), ["source", "token"]
    ).select(
        "source",
        "token",
        F.round((F.col("f").cast(_D) - mean) / std, 6)
        .cast("decimal(18,6)")
        .alias("z"),
    )
    z2 = z.select(
        F.col("source").alias("source2"),
        "token",
        F.col("z").alias("zz"),
    )
    pairs = (
        z.join(z2, "token")
        .filter(F.col("source") < F.col("source2"))
        .groupBy("source", "source2")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.abs(F.col("z") - F.col("zz"))).alias("sd"),
        )
    )
    return pairs.select(
        "source",
        "source2",
        F.col("k").cast("bigint").alias("n_tokens"),
        F.round(F.col("sd").cast(_D) / F.col("k").cast(_D), 6).alias("delta"),
    ).orderBy("source", "source2")


_SQL_BURROWS_DELTA = rf"""
WITH toks AS MATERIALIZED (
  SELECT source, token
  FROM documents, UNNEST(string_split_regex(lower(text), '\s+')) AS u(token)
  WHERE token <> ''
), top AS MATERIALIZED (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rk
    FROM toks GROUP BY token
  ) WHERE rk <= {_BD_TOPK}
), per_src_tok AS (
  SELECT source, token, COUNT(*) AS c FROM toks JOIN top USING (token)
  GROUP BY 1, 2
), src_tot AS MATERIALIZED (
  SELECT source, COUNT(*) AS tot FROM toks GROUP BY 1
), dense AS MATERIALIZED (
  SELECT s.source, t.token,
         CAST(round(CAST(COALESCE(p.c, 0) AS DOUBLE) / CAST(st.tot AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS f
  FROM (SELECT source FROM src_tot) s
  CROSS JOIN top t
  LEFT JOIN per_src_tok p ON p.source = s.source AND p.token = t.token
  JOIN src_tot st ON st.source = s.source
), stats AS (
  SELECT token, COUNT(*) AS ns, SUM(f) AS sf, SUM(f * f) AS sff
  FROM dense GROUP BY 1
), z AS MATERIALIZED (
  SELECT d.source, d.token,
         CAST(round((CAST(d.f AS DOUBLE)
                     - CAST(s.sf AS DOUBLE) / CAST(s.ns AS DOUBLE))
                    / sqrt((CAST(s.ns AS DOUBLE) * CAST(s.sff AS DOUBLE)
                            - CAST(s.sf AS DOUBLE) * CAST(s.sf AS DOUBLE))
                           / (CAST(s.ns AS DOUBLE)
                              * (CAST(s.ns AS DOUBLE) - 1.0))), 6)
              AS DECIMAL(18,6)) AS z
  FROM dense d JOIN stats s USING (token)
)
SELECT a.source, b.source AS source2,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(abs(a.z - b.z)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS delta
FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


SESSION8_QUERIES.extend(
    [
        QueryDef(
            "q_rolling_beta", _q_rolling_beta, _SQL_ROLLING_BETA,
            "rolling 7-day OLS beta from windowed moments",
        ),
        QueryDef(
            "q_partial_corr", _q_partial_corr, _SQL_PARTIAL_CORR,
            "partial correlation controlling for order count",
        ),
        QueryDef(
            "q_burrows_delta", _q_burrows_delta, _SQL_BURROWS_DELTA,
            "Burrows' Delta stylometric source distance",
        ),
    ]
)
