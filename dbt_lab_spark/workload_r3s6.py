"""r3 session-6 additions: experimentation causal estimators
(difference-in-differences, sequential probability ratio test),
robust time-series cleaning (Hampel rolling-median/MAD filter),
distributed order statistics (weighted median), and distribution-free
uncertainty quantification (split-conformal prediction intervals).
Same (builder, oracle) contract as dbt_lab_spark.workload.

Reference capability evidence: the reference's aggregate + join +
sort physical operators (qexec/PhysicalOperators*.java) and its
Hadoop bulk-operator extension point
(mapred/qexec/examples/CountTuplesOperator.java:36-67); each query
re-expresses one distributed shape a user of that surface would
build, Spark-first.

Determinism: the repo's cross-engine exactness conventions —
integer/decimal arithmetic end-to-end where possible, frozen-ln
DECIMAL literals for transcendental constants, identical
double-formula parenthesization in both engines, deterministic
tie-breaks on every argmin/quantile pick.
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
# difference-in-differences over a no-RNG customer split
# ---------------------------------------------------------------------------

_DID_PIVOT = "1998-01-01"


def _q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 difference-in-differences: customers md5-split into arms
    A/B (no RNG), periods pre/post the 1998-01-01 pivot, outcome =
    mean order totalprice per cell; DID = (A_post - A_pre) -
    (B_post - B_pre).  All four cell sums stay exact DECIMAL and each
    mean is ONE double division; the DID combines the four means with
    one identically-parenthesized formula, so both engines agree
    bit-for-bit.  Scale: one orders+customer broadcast-free equi-join
    (customer is the small side and broadcast), one 4-cell hash
    aggregate, then a 1-row reduce."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = scan(spark, cat, "customer", ["c_custkey"])
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("did"))), 1, 1
        ).isin(*list("01234567")),
        "A",
    ).otherwise("B")
    post = (F.col("o_orderdate") >= F.lit(_DID_PIVOT).cast("timestamp")).cast("int")
    cells = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(arm.alias("arm"), post.alias("post"), money("o_totalprice").alias("y"))
        .groupBy()
        .agg(
            *[
                f
                for a in "AB"
                for p in (0, 1)
                for f in (
                    F.sum(
                        F.when((F.col("arm") == a) & (F.col("post") == p), 1).otherwise(0)
                    ).alias(f"n_{a.lower()}{p}"),
                    F.sum(
                        F.when((F.col("arm") == a) & (F.col("post") == p), F.col("y"))
                    ).alias(f"s_{a.lower()}{p}"),
                )
            ]
        )
    )

    def m(a: str, p: int):
        return F.col(f"s_{a}{p}").cast(_D) / F.col(f"n_{a}{p}").cast(_D)

    did = (m("a", 1) - m("a", 0)) - (m("b", 1) - m("b", 0))
    return cells.select(
        F.col("n_a0").cast("bigint").alias("n_a_pre"),
        F.col("n_a1").cast("bigint").alias("n_a_post"),
        F.col("n_b0").cast("bigint").alias("n_b_pre"),
        F.col("n_b1").cast("bigint").alias("n_b_post"),
        F.round(m("a", 0), 6).alias("mean_a_pre"),
        F.round(m("a", 1), 6).alias("mean_a_post"),
        F.round(m("b", 0), 6).alias("mean_b_pre"),
        F.round(m("b", 1), 6).alias("mean_b_post"),
        F.round(did, 6).alias("did_estimate"),
    )


_SQL_DID = f"""
WITH cells AS (
  SELECT
    SUM(CASE WHEN arm = 'A' AND post = 0 THEN 1 ELSE 0 END) AS n_a0,
    SUM(CASE WHEN arm = 'A' AND post = 0 THEN y END) AS s_a0,
    SUM(CASE WHEN arm = 'A' AND post = 1 THEN 1 ELSE 0 END) AS n_a1,
    SUM(CASE WHEN arm = 'A' AND post = 1 THEN y END) AS s_a1,
    SUM(CASE WHEN arm = 'B' AND post = 0 THEN 1 ELSE 0 END) AS n_b0,
    SUM(CASE WHEN arm = 'B' AND post = 0 THEN y END) AS s_b0,
    SUM(CASE WHEN arm = 'B' AND post = 1 THEN 1 ELSE 0 END) AS n_b1,
    SUM(CASE WHEN arm = 'B' AND post = 1 THEN y END) AS s_b1
  FROM (
    SELECT CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR) || 'did'), 1, 1)
                BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm,
           CASE WHEN o_orderdate >= TIMESTAMP '{_DID_PIVOT}' THEN 1 ELSE 0 END AS post,
           CAST(o_totalprice AS DECIMAL(18,2)) AS y
    FROM orders JOIN customer ON o_custkey = c_custkey
  )
)
SELECT CAST(n_a0 AS BIGINT) AS n_a_pre, CAST(n_a1 AS BIGINT) AS n_a_post,
       CAST(n_b0 AS BIGINT) AS n_b_pre, CAST(n_b1 AS BIGINT) AS n_b_post,
       round(CAST(s_a0 AS DOUBLE) / CAST(n_a0 AS DOUBLE), 6) AS mean_a_pre,
       round(CAST(s_a1 AS DOUBLE) / CAST(n_a1 AS DOUBLE), 6) AS mean_a_post,
       round(CAST(s_b0 AS DOUBLE) / CAST(n_b0 AS DOUBLE), 6) AS mean_b_pre,
       round(CAST(s_b1 AS DOUBLE) / CAST(n_b1 AS DOUBLE), 6) AS mean_b_post,
       round((CAST(s_a1 AS DOUBLE) / CAST(n_a1 AS DOUBLE)
              - CAST(s_a0 AS DOUBLE) / CAST(n_a0 AS DOUBLE))
             - (CAST(s_b1 AS DOUBLE) / CAST(n_b1 AS DOUBLE)
                - CAST(s_b0 AS DOUBLE) / CAST(n_b0 AS DOUBLE)), 6) AS did_estimate
FROM cells
"""


# ---------------------------------------------------------------------------
# sequential probability ratio test over the daily purchase share
# ---------------------------------------------------------------------------

# frozen-ln constants (exact decimal literals in BOTH engines):
# ln(0.55/0.45) rounded to 6 places; Wald bounds ln(19) for
# alpha = beta = 0.05.
_SPRT_L1 = "0.200671"
_SPRT_BOUND = "2.944439"


def _q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT on the daily purchase share: H0 p=0.45 vs H1 p=0.55
    over Bernoulli trials (purchase vs view), batched per day — the
    always-valid sequential A/B monitor.  Each day adds the exact
    DECIMAL increment (2*k - m) * L1 where L1 = frozen ln(11/9)
    (symmetric hypotheses make the two log terms +/-L1), so the
    cumulative LLR walk is an exact decimal; boundary compares
    (+/- ln 19) are decimal-exact too.  Scale: one events hash
    aggregate to the ~30-row day grain, then one cumulative window."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(F.col("event_type").isin("view", "purchase"))
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("s"),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("m"), F.sum("s").alias("k"))
    )
    l1 = F.lit(_SPRT_L1).cast("decimal(18,6)")
    bound = F.lit(_SPRT_BOUND).cast("decimal(18,6)")
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walk = daily.select(
        "day",
        "m",
        "k",
        F.sum((2 * F.col("k") - F.col("m")) * l1).over(wc).alias("llr"),
    )
    state = (
        F.when(F.col("llr") >= bound, "accept_h1")
        .when(F.col("llr") <= -bound, "accept_h0")
        .otherwise("continue")
    )
    flagged = walk.select(
        "day",
        F.col("m").cast("bigint").alias("n_trials"),
        F.col("k").cast("bigint").alias("n_success"),
        F.col("llr").cast(_D).alias("cum_llr"),
        state.alias("state"),
    )
    wall = Window.partitionBy()
    return (
        flagged.withColumn(
            "first_cross",
            F.min(F.when(F.col("state") != "continue", F.col("day"))).over(wall),
        )
        .orderBy("day")
    )


_SQL_SPRT = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS m,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
), walk AS (
  SELECT day, m, k,
         SUM((2 * k - m) * CAST({_SPRT_L1} AS DECIMAL(18,6)))
           OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS llr
  FROM daily
), flagged AS (
  SELECT day, CAST(m AS BIGINT) AS n_trials, CAST(k AS BIGINT) AS n_success,
         CAST(llr AS DOUBLE) AS cum_llr,
         CASE WHEN llr >= CAST({_SPRT_BOUND} AS DECIMAL(18,6)) THEN 'accept_h1'
              WHEN llr <= -CAST({_SPRT_BOUND} AS DECIMAL(18,6)) THEN 'accept_h0'
              ELSE 'continue' END AS state
  FROM walk
)
SELECT *, MIN(CASE WHEN state <> 'continue' THEN day END) OVER () AS first_cross
FROM flagged
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Hampel filter: rolling-median/MAD outliers on the hourly series
# ---------------------------------------------------------------------------

_HAMPEL_HALF = 3  # window = center +/- 3 hours (7 points)


def _q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter on the hourly event-count series: flag
    hours where |y - rolling_median| > 3 * rolling_MAD, both statistics
    exact discrete medians over the +/-3-hour band — the robust
    complement to q_zscore_outliers (one wild hour cannot drag its own
    threshold the way it drags a mean/stddev).  EVERYTHING stays
    integer: counts, medians (lower median at rank (cnt+1)/2 with
    value-ordered rank), absolute deviations, and the 3*MAD compare —
    zero float drift by construction.  Scale: two band self-joins on
    the COMPRESSED hourly grain (|hours| x 7 tuples), never raw
    events; the events pass is one hash aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        F.floor(F.unix_millis("ts") / F.lit(3600000.0)).cast("long").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.count(F.lit(1)).alias("y"))
    nb = hourly.select(F.col("h").alias("hn"), F.col("y").alias("yn"))
    band = hourly.join(
        nb,
        (F.col("hn") >= F.col("h") - _HAMPEL_HALF)
        & (F.col("hn") <= F.col("h") + _HAMPEL_HALF),
    )
    wmed = Window.partitionBy("h").orderBy("yn", "hn")
    med = (
        band.select(
            "h",
            "y",
            "yn",
            F.row_number().over(wmed).alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy("h")).alias("cnt"),
        )
        .filter(F.col("r") * 2 == F.col("cnt") + (F.col("cnt") % 2))
        .select("h", "y", F.col("yn").alias("med"), "cnt")
    )
    dev = med.join(
        nb.select(F.col("hn").alias("hn2"), F.col("yn").alias("yn2")),
        (F.col("hn2") >= F.col("h") - _HAMPEL_HALF)
        & (F.col("hn2") <= F.col("h") + _HAMPEL_HALF),
    ).select("h", "y", "med", "cnt", F.abs(F.col("yn2") - F.col("med")).alias("ad"), "hn2")
    wmad = Window.partitionBy("h").orderBy("ad", "hn2")
    mad = (
        dev.select(
            "h",
            "y",
            "med",
            "cnt",
            "ad",
            F.row_number().over(wmad).alias("r"),
        )
        .filter(F.col("r") * 2 == F.col("cnt") + (F.col("cnt") % 2))
        .select("h", "y", "med", F.col("ad").alias("mad"), "cnt")
    )
    return (
        mad.filter(F.abs(F.col("y") - F.col("med")) > 3 * F.col("mad"))
        .select(
            F.col("h").cast("bigint").alias("hour"),
            F.col("y").cast("bigint").alias("y"),
            F.col("med").cast("bigint").alias("rolling_med"),
            F.col("mad").cast("bigint").alias("rolling_mad"),
            F.col("cnt").cast("bigint").alias("window_n"),
        )
        .orderBy("hour")
    )


_SQL_HAMPEL = f"""
WITH hourly AS MATERIALIZED (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h, COUNT(*) AS y
  FROM events GROUP BY 1
), band AS (
  SELECT c.h, c.y, n.h AS hn, n.y AS yn
  FROM hourly c JOIN hourly n
    ON n.h BETWEEN c.h - {_HAMPEL_HALF} AND c.h + {_HAMPEL_HALF}
), med AS MATERIALIZED (
  SELECT h, y, yn AS med, cnt FROM (
    SELECT h, y, yn,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY yn, hn) AS r,
           COUNT(*) OVER (PARTITION BY h) AS cnt
    FROM band
  ) WHERE r * 2 = cnt + (cnt % 2)
), dev AS (
  SELECT m.h, m.y, m.med, m.cnt, abs(n.y - m.med) AS ad, n.h AS hn2
  FROM med m JOIN hourly n
    ON n.h BETWEEN m.h - {_HAMPEL_HALF} AND m.h + {_HAMPEL_HALF}
), mad AS (
  SELECT h, y, med, ad AS mad, cnt FROM (
    SELECT h, y, med, cnt, ad,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY ad, hn2) AS r
    FROM dev
  ) WHERE r * 2 = cnt + (cnt % 2)
)
SELECT CAST(h AS BIGINT) AS hour, CAST(y AS BIGINT) AS y,
       CAST(med AS BIGINT) AS rolling_med, CAST(mad AS BIGINT) AS rolling_mad,
       CAST(cnt AS BIGINT) AS window_n
FROM mad WHERE abs(y - med) > 3 * mad
ORDER BY hour
"""


# ---------------------------------------------------------------------------
# exact weighted median per group (cumulative-weight scan)
# ---------------------------------------------------------------------------


def _q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median of lineitem extendedprice per
    supplier nation — the distributed order statistic that needs a
    cumulative-weight scan, not a plain rank (a 50-unit line pulls the
    median 50x harder than a 1-unit line).  Lower weighted median:
    first value (price-ordered, deterministic (price, orderkey,
    linenumber) tie-break) whose running weight w satisfies
    2*cumw >= totw, ENTIRELY in integers (quantities) and canonical
    DECIMAL prices.  Scale: one nation-partitioned window over
    lineitem (shuffle ratio 1.0, the window class); supplier/nation
    broadcast."""
    cat = Catalog(sf_dir)
    li = scan(
        spark,
        cat,
        "lineitem",
        ["l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"],
    )
    supp = scan(spark, cat, "supplier", ["s_suppkey", "s_nationkey"])
    nation = scan(spark, cat, "nation", ["n_nationkey", "n_name"])
    rows = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            money("l_extendedprice").alias("p"),
            F.col("l_quantity").cast("long").alias("w"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    wn = Window.partitionBy("n_name").orderBy("p", "l_orderkey", "l_linenumber")
    wall = Window.partitionBy("n_name")
    scanned = rows.select(
        "n_name",
        "p",
        "w",
        F.sum("w").over(wn.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cumw"),
        F.sum("w").over(wall).alias("totw"),
        F.count(F.lit(1)).over(wall).alias("n_lines"),
    )
    hit = scanned.filter(2 * F.col("cumw") >= F.col("totw"))
    first = hit.withColumn(
        "rn", F.row_number().over(Window.partitionBy("n_name").orderBy("cumw", "p"))
    ).filter(F.col("rn") == 1)
    return first.select(
        "n_name",
        F.col("p").cast(_D).alias("wmedian_price"),
        F.col("totw").cast("bigint").alias("total_qty"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
    ).orderBy("n_name")


_SQL_WEIGHTED_MEDIAN = """
WITH rows_w AS (
  SELECT n_name, CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
), scanned AS (
  SELECT n_name, p, w,
         SUM(w) OVER (PARTITION BY n_name
                      ORDER BY p, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(w) OVER (PARTITION BY n_name) AS totw,
         COUNT(*) OVER (PARTITION BY n_name) AS n_lines
  FROM rows_w
)
SELECT n_name, CAST(p AS DOUBLE) AS wmedian_price,
       CAST(totw AS BIGINT) AS total_qty, CAST(n_lines AS BIGINT) AS n_lines
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cumw, p) AS rn
  FROM scanned WHERE 2 * cumw >= totw
) WHERE rn = 1
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# split-conformal prediction interval with holdout coverage
# ---------------------------------------------------------------------------


def _q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% prediction interval for order totalprice
    given customer acctbal: OLS fit + residual quantile on the
    md5-split calibration half, coverage audited on the holdout —
    distribution-free uncertainty quantification for any point
    predictor.  The OLS betas come from exact integer-CENT calibration
    moments (one identically-parenthesized double formula each);
    every residual |y - (b0 + b1*x)| is then a deterministic IEEE
    double in both engines, so the rank-ceil(0.9*(n+1)) quantile pick
    (residual-ordered, orderkey tie-break) and the <= q coverage
    compare agree exactly.  Scale: one orders+customer broadcast join,
    one moment aggregate, one residual-ordered window on the
    calibration half, one holdout reduce."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey",
            (money("c_acctbal") * 100).cast("long").alias("x"),
            (money("o_totalprice") * 100).cast("long").alias("y"),
            F.when(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("conf"))),
                    1,
                    1,
                ).isin(*list("01234567")),
                "cal",
            )
            .otherwise("test")
            .alias("split"),
        )
    )
    mom = base.filter(F.col("split") == "cal").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast(_D)
    b1 = (nd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)) / (
        nd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    )
    b0 = (F.col("sy").cast(_D) - b1 * F.col("sx").cast(_D)) / nd
    fitted = mom.select(
        "n", b0.alias("b0"), b1.alias("b1")
    )
    scored = base.crossJoin(F.broadcast(fitted)).select(
        "o_orderkey",
        "split",
        F.abs(
            F.col("y").cast(_D) - (F.col("b0") + F.col("b1") * F.col("x").cast(_D))
        ).alias("r"),
        "n",
        "b0",
        "b1",
    )
    cal = scored.filter(F.col("split") == "cal")
    # conformal rank: ceil(0.9 * (n + 1)), clamped to n
    qrank = F.least(F.ceil(F.lit(0.9) * (F.col("n") + 1).cast(_D)), F.col("n"))
    qrow = (
        cal.withColumn("rk", F.row_number().over(Window.orderBy("r", "o_orderkey")))
        .filter(F.col("rk") == qrank)
        .select(F.col("r").alias("q_hat"), "n", "b0", "b1")
    )
    test = scored.filter(F.col("split") == "test").crossJoin(
        F.broadcast(qrow.select("q_hat"))
    )
    cov = test.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.col("r") <= F.col("q_hat")).cast("long")).alias("n_in"),
    )
    return (
        cov.crossJoin(F.broadcast(qrow))
        .select(
            F.col("n").cast("bigint").alias("n_cal"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.round(F.col("b1"), 6).alias("beta1"),
            F.round(F.col("q_hat") / 100.0, 6).alias("q_hat"),
            F.round(F.col("n_in").cast(_D) / F.col("n_test").cast(_D), 6).alias(
                "coverage"
            ),
        )
    )


_SQL_CONFORMAL = """
WITH base AS MATERIALIZED (
  SELECT o_orderkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
         CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || 'conf'), 1, 1)
              BETWEEN '0' AND '7' THEN 'cal' ELSE 'test' END AS split
  FROM orders JOIN customer ON o_custkey = c_custkey
), mom AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM base WHERE split = 'cal'
), fitted AS MATERIALIZED (
  SELECT n,
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS b0,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b1
  FROM mom
), scored AS MATERIALIZED (
  SELECT b.o_orderkey, b.split,
         abs(CAST(b.y AS DOUBLE) - (f.b0 + f.b1 * CAST(b.x AS DOUBLE))) AS r,
         f.n, f.b0, f.b1
  FROM base b CROSS JOIN fitted f
), qrow AS MATERIALIZED (
  SELECT r AS q_hat, n, b0, b1 FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY r, o_orderkey) AS rk
    FROM scored WHERE split = 'cal'
  ) WHERE rk = least(CAST(ceil(0.9 * CAST(n + 1 AS DOUBLE)) AS BIGINT), n)
), cov AS (
  SELECT COUNT(*) AS n_test,
         SUM(CASE WHEN s.r <= q.q_hat THEN 1 ELSE 0 END) AS n_in
  FROM scored s CROSS JOIN qrow q WHERE s.split = 'test'
)
SELECT CAST(q.n AS BIGINT) AS n_cal, CAST(c.n_test AS BIGINT) AS n_test,
       round(q.b1, 6) AS beta1,
       round(q.q_hat / 100.0, 6) AS q_hat,
       round(CAST(c.n_in AS DOUBLE) / CAST(c.n_test AS DOUBLE), 6) AS coverage
FROM cov c CROSS JOIN qrow q
"""


SESSION6_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_did", _q_did, _SQL_DID,
        "2x2 difference-in-differences over a no-RNG customer split",
    ),
    QueryDef(
        "q_sprt", _q_sprt, _SQL_SPRT,
        "Wald SPRT daily LLR walk (frozen-ln exact decimal)",
    ),
    QueryDef(
        "q_hampel", _q_hampel, _SQL_HAMPEL,
        "Hampel rolling-median/MAD outliers, all-integer",
    ),
    QueryDef(
        "q_weighted_median", _q_weighted_median, _SQL_WEIGHTED_MEDIAN,
        "exact weighted median via cumulative-weight scan",
    ),
    QueryDef(
        "q_conformal", _q_conformal, _SQL_CONFORMAL,
        "split-conformal 90% interval with holdout coverage",
    ),
]


# ---------------------------------------------------------------------------
# k-core: 3 unrolled peel rounds on the undirected trade graph
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership after 3 unrolled peel rounds on the
    undirected top-3 trade graph: each round drops nodes whose degree
    in the CURRENT induced subgraph is < k, the classic cohesive-core
    decomposition step (distinct from q_triangles' local clustering
    and q_bfs_hops' reachability).  Degrees are exact integer counts;
    the round count is fixed so the oracle can unroll the identical
    peel as chained CTEs (the q_label_prop pattern); the test suite
    pins that 3 rounds reach the fixpoint on this topology.  Scale:
    each round is one edges-groupBy + one semi-join."""
    from dbt_lab_spark.workload_extras import _trade_edges_topk

    edges = _trade_edges_topk(spark, sf_dir)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    alive = sym.select("u").distinct()
    deg = None
    for _ in range(_KCORE_ROUNDS):
        cur = (
            sym.join(alive, "u")
            .join(alive.select(F.col("u").alias("v")), "v")
        )
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= _KCORE_K).select("u")
    nation = scan(spark, Catalog(sf_dir), "nation", ["n_nationkey", "n_name"])
    nodes = sym.select("u").distinct()
    out = (
        nodes.join(deg, "u", "left")
        .join(alive.withColumn("in_core", F.lit(True)), "u", "left")
        .join(F.broadcast(nation), F.col("u") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.coalesce("deg", F.lit(0)).cast("bigint").alias("last_degree"),
            F.coalesce("in_core", F.lit(False)).alias("in_core"),
        )
    )
    return out.orderBy(F.desc("in_core"), F.desc("last_degree"), "n_name")


def _sql_kcore() -> str:
    from dbt_lab_spark.workload_extras import _SQL_TRADE_EDGES

    parts = [
        f"""WITH {_SQL_TRADE_EDGES},
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
), sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
),
alive0 AS MATERIALIZED (SELECT DISTINCT u FROM sym)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f""",
deg{r} AS MATERIALIZED (
  SELECT s.u, COUNT(*) AS deg
  FROM sym s
  JOIN alive{r - 1} x ON x.u = s.u
  JOIN alive{r - 1} y ON y.u = s.v
  GROUP BY 1
), alive{r} AS MATERIALIZED (
  SELECT u FROM deg{r} WHERE deg >= {_KCORE_K}
)"""
        )
    parts.append(
        f"""
SELECT n_name,
       CAST(COALESCE(d.deg, 0) AS BIGINT) AS last_degree,
       (a.u IS NOT NULL) AS in_core
FROM alive0 n0
LEFT JOIN deg{_KCORE_ROUNDS} d ON d.u = n0.u
LEFT JOIN alive{_KCORE_ROUNDS} a ON a.u = n0.u
JOIN nation ON n_nationkey = n0.u
ORDER BY in_core DESC, last_degree DESC, n_name"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Q-Q plot: exact discrete quantile ladder, view vs purchase values
# ---------------------------------------------------------------------------


def _q_qq_plot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q comparison of the 'view' vs 'purchase' value distributions
    at the 19 vigintiles (5%..95%): each side's quantile is the EXACT
    discrete order statistic at rank ceil(q*n/100), found on the
    COMPRESSED per-distinct-value cumulative-count frame (the
    q_ks_test compression), so no raw-row sort ever happens.  The
    rank uses pure integer arithmetic ((q*n + 99) div 100); the
    (rank > cum - cnt AND rank <= cum) band match selects EXACTLY one
    compressed row per quantile.  Scale: two hash aggregates + a
    19 x |distinct-values| band join on the compressed domain."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "event_type", money("value").alias("v")
    ).filter(F.col("event_type").isin("view", "purchase"))
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
    qs = spark.range(1, 20).select((F.col("id") * 5).cast("int").alias("q"))
    hit = qs.join(
        cum,
        (F.expr("(q * n + 99) div 100") > F.col("cum") - F.col("cnt"))
        & (F.expr("(q * n + 99) div 100") <= F.col("cum")),
    )
    pivoted = (
        hit.groupBy("q")
        .pivot("event_type", ["view", "purchase"])
        .agg(F.min("v"))
        .select(
            "q",
            F.col("view").cast(_D).alias("q_view"),
            F.col("purchase").cast(_D).alias("q_purchase"),
            (F.col("purchase").cast(_D) - F.col("view").cast(_D)).alias("qq_diff"),
        )
    )
    return pivoted.orderBy("q")


_SQL_QQ_PLOT = """
WITH ev AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE event_type IN ('view', 'purchase')
), cum AS MATERIALIZED (
  SELECT event_type, v, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM (SELECT event_type, v, COUNT(*) AS cnt FROM ev GROUP BY 1, 2)
), qs AS (SELECT CAST(range * 5 AS INT) AS q FROM range(1, 20)),
hit AS (
  SELECT qs.q, c.event_type, c.v
  FROM qs JOIN cum c
    ON (qs.q * c.n + 99) // 100 > c.cum - c.cnt
   AND (qs.q * c.n + 99) // 100 <= c.cum
)
SELECT q,
       CAST(MIN(CASE WHEN event_type = 'view' THEN v END) AS DOUBLE) AS q_view,
       CAST(MIN(CASE WHEN event_type = 'purchase' THEN v END) AS DOUBLE) AS q_purchase,
       CAST(MIN(CASE WHEN event_type = 'purchase' THEN v END) AS DOUBLE)
       - CAST(MIN(CASE WHEN event_type = 'view' THEN v END) AS DOUBLE) AS qq_diff
FROM hit GROUP BY q
ORDER BY q
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily event-count moves
# ---------------------------------------------------------------------------


def _q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily
    event-count up/down sequence: count sign runs among nonzero
    day-over-day moves, compare with the null mean 2*n1*n2/(n1+n2)+1 —
    the nonparametric trend-free randomness check next to
    q_mann_kendall's monotone-trend test.  Runs, n1, n2 are exact
    integers from two lag windows; z is one identically-parenthesized
    double formula.  Scale: one events hash aggregate to the day
    grain, then two windows over ~30 rows."""
    cat = Catalog(sf_dir)
    daily = (
        cat.table(spark, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    wd = Window.orderBy("day")
    signs = (
        daily.select(
            "day", (F.col("y") - F.lag("y").over(wd)).alias("d")
        )
        .filter(F.col("d").isNotNull() & (F.col("d") != 0))
        .select("day", F.signum("d").cast("int").alias("s"))
    )
    ws = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(ws).isNull() | (F.lag("s").over(ws) != F.col("s")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n2"),
        F.sum("new_run").alias("runs"),
    )
    n1d = F.col("n1").cast(_D)
    n2d = F.col("n2").cast(_D)
    mu = 2.0 * n1d * n2d / (n1d + n2d) + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n1d + n2d - 1.0)
    z = (F.col("runs").cast(_D) - mu) / F.sqrt(var)
    return agg.select(
        F.col("n1").cast("bigint").alias("n_up"),
        F.col("n2").cast("bigint").alias("n_down"),
        F.col("runs").cast("bigint").alias("n_runs"),
        F.round(mu, 6).alias("mu_runs"),
        F.round(z, 6).alias("z_stat"),
    )


_SQL_RUNS_TEST = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y FROM events GROUP BY 1
), signs AS (
  SELECT day, CAST(sign(d) AS INT) AS s FROM (
    SELECT day, y - lag(y) OVER (ORDER BY day) AS d FROM daily
  ) WHERE d IS NOT NULL AND d <> 0
), runs AS (
  SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                   OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run
  FROM signs
), agg AS (
  SELECT SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n2,
         SUM(new_run) AS runs
  FROM runs
)
SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down,
       CAST(runs AS BIGINT) AS n_runs,
       round(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0, 6) AS mu_runs,
       round((CAST(runs AS DOUBLE)
              - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
             / sqrt(((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0) - 1.0)
                    * ((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0) - 2.0)
                    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)), 6) AS z_stat
FROM agg
"""


# ---------------------------------------------------------------------------
# histogram-based best-split gain (the GBDT tree-learner primitive)
# ---------------------------------------------------------------------------

_SPLIT_BIN_CENTS = 50000  # 500.00 acctbal per histogram bin


def _q_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based best-split search — the LightGBM/XGBoost
    tree-learner inner loop — for predicting order totalprice from
    customer acctbal: bin the feature into fixed 500.00-wide bins,
    accumulate per-bin gradient sums, and score every split boundary
    with gain = GL^2/(HL+1) + GR^2/(HR+1) (squared-loss gradients,
    lambda = 1; the parent term vanishes because residuals sum to 0).
    Gradients are kept EXACT by the n-scaling trick (g_i = n*y_i - S
    in integer cents, accumulated in DECIMAL(38,0)); each candidate's
    gain is one identically-parenthesized double formula on the
    n-normalized GL.  Scale: one broadcast join + one per-bin hash
    aggregate; the split scan is a window over ~25 bins."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.floor((money("c_acctbal") * 100).cast("long") / F.lit(float(_SPLIT_BIN_CENTS)))
        .cast("long")
        .alias("bin"),
        (money("o_totalprice") * 100).cast("long").alias("yc"),
    )
    per_bin = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("c"), F.sum("yc").alias("s")
    )
    tot = per_bin.agg(
        F.sum("c").alias("n"), F.sum("s").cast("decimal(38,0)").alias("st")
    )
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "st",
        F.sum("c").over(wb).alias("cl"),
        F.sum(F.col("s").cast("decimal(38,0)")).over(wb).alias("sl"),
        F.max("bin").over(Window.partitionBy()).alias("maxbin"),
    )
    # GL in true-cent units: (n*sl - cl*st) / n, as a double
    gl = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("sl")
            - F.col("cl").cast("decimal(38,0)") * F.col("st")
        ).cast(_D)
        / F.col("n").cast(_D)
        / F.lit(100.0)
    )
    hl = F.col("cl").cast(_D)
    hr = (F.col("n") - F.col("cl")).cast(_D)
    gain = gl * gl / (hl + 1.0) + (gl * gl) / (hr + 1.0)
    scored = cum.filter(F.col("bin") < F.col("maxbin")).select(
        "bin",
        "cl",
        "n",
        "sl",
        "st",
        gain.alias("gain"),
    )
    best = scored.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("gain"), "bin"))
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("bin").cast("bigint").alias("split_bin"),
        ((F.col("bin") + 1) * F.lit(_SPLIT_BIN_CENTS / 100.0)).alias("split_value"),
        F.col("cl").cast("bigint").alias("n_left"),
        (F.col("n") - F.col("cl")).cast("bigint").alias("n_right"),
        F.round(F.col("sl").cast(_D) / F.col("cl").cast(_D) / 100.0, 6).alias(
            "mean_left"
        ),
        F.round(
            (F.col("st") - F.col("sl")).cast(_D)
            / (F.col("n") - F.col("cl")).cast(_D)
            / 100.0,
            6,
        ).alias("mean_right"),
        F.round(F.col("gain"), 4).alias("gain"),
    )


_SQL_SPLIT_GAIN = f"""
WITH base AS (
  SELECT CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    / {float(_SPLIT_BIN_CENTS)}) AS BIGINT) AS bin,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
  FROM orders JOIN customer ON o_custkey = c_custkey
), per_bin AS (
  SELECT bin, COUNT(*) AS c, SUM(yc) AS s FROM base GROUP BY 1
), tot AS (
  SELECT SUM(c) AS n, CAST(SUM(s) AS DECIMAL(38,0)) AS st FROM per_bin
), cum AS (
  SELECT bin, n, st,
         SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cl,
         SUM(CAST(s AS DECIMAL(38,0))) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS sl,
         MAX(bin) OVER () AS maxbin
  FROM per_bin CROSS JOIN tot
), scored AS (
  SELECT bin, cl, n, sl, st,
         (CAST(CAST(n AS DECIMAL(38,0)) * sl
               - CAST(cl AS DECIMAL(38,0)) * st AS DOUBLE)
          / CAST(n AS DOUBLE) / 100.0)
         * (CAST(CAST(n AS DECIMAL(38,0)) * sl
                 - CAST(cl AS DECIMAL(38,0)) * st AS DOUBLE)
            / CAST(n AS DOUBLE) / 100.0)
         / (CAST(cl AS DOUBLE) + 1.0)
         + (CAST(CAST(n AS DECIMAL(38,0)) * sl
                 - CAST(cl AS DECIMAL(38,0)) * st AS DOUBLE)
            / CAST(n AS DOUBLE) / 100.0)
           * (CAST(CAST(n AS DECIMAL(38,0)) * sl
                   - CAST(cl AS DECIMAL(38,0)) * st AS DOUBLE)
              / CAST(n AS DOUBLE) / 100.0)
           / (CAST(n - cl AS DOUBLE) + 1.0) AS gain
  FROM cum WHERE bin < maxbin
)
SELECT CAST(bin AS BIGINT) AS split_bin,
       (bin + 1) * {_SPLIT_BIN_CENTS / 100.0} AS split_value,
       CAST(cl AS BIGINT) AS n_left,
       CAST(n - cl AS BIGINT) AS n_right,
       round(CAST(sl AS DOUBLE) / CAST(cl AS DOUBLE) / 100.0, 6) AS mean_left,
       round(CAST(st - sl AS DOUBLE) / CAST(n - cl AS DOUBLE) / 100.0, 6) AS mean_right,
       round(gain, 4) AS gain
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY gain DESC, bin) AS rn FROM scored
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# grouped log-log price elasticity per part brand
# ---------------------------------------------------------------------------


def _q_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per part brand: the grouped
    OLS slope of ln(quantity) on ln(line price) — 25 simultaneous
    regressions in ONE aggregate pass (the grouped-regression shape;
    q_ols/q_cv_ols fit one global model).  Both logs are frozen to
    round-6 DECIMAL(18,6) before any accumulation, so all five moments
    per brand are exact decimals and the slope is one
    identically-parenthesized double formula.  Scale: lineitem-part
    equi-join (part broadcast at these SFs, shuffle-hash beyond) +
    one 25-group hash aggregate."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", ["l_partkey", "l_extendedprice", "l_quantity"])
    part = scan(spark, cat, "part", ["p_partkey", "p_brand"])
    base = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.round(F.log(money("l_extendedprice").cast(_D)), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("l_quantity").cast(_D)), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    mom = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast(_D)
    slope = (nd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)) / (
        nd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    )
    return mom.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_lines"),
        F.round(slope, 6).alias("elasticity"),
        F.round(F.col("sy").cast(_D) / nd, 6).alias("mean_ln_qty"),
    ).orderBy("p_brand")


_SQL_ELASTICITY = """
WITH base AS (
  SELECT p_brand,
         CAST(round(ln(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS x,
         CAST(round(ln(CAST(l_quantity AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), mom AS (
  SELECT p_brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM base GROUP BY 1
)
SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS elasticity,
       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_ln_qty
FROM mom
ORDER BY p_brand
"""


SESSION6_QUERIES.extend(
    [
        QueryDef(
            "q_kcore", _q_kcore, _sql_kcore(),
            "3-core membership via 3 unrolled peel rounds",
        ),
        QueryDef(
            "q_qq_plot", _q_qq_plot, _SQL_QQ_PLOT,
            "Q-Q vigintile ladder on the compressed value domain",
        ),
        QueryDef(
            "q_runs_test", _q_runs_test, _SQL_RUNS_TEST,
            "Wald-Wolfowitz runs test on daily moves",
        ),
        QueryDef(
            "q_split_gain", _q_split_gain, _SQL_SPLIT_GAIN,
            "histogram best-split gain (GBDT inner loop), exact gradients",
        ),
        QueryDef(
            "q_elasticity", _q_elasticity, _SQL_ELASTICITY,
            "grouped log-log elasticity, 25 regressions in one pass",
        ),
    ]
)
