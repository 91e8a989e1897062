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


# ---------------------------------------------------------------------------
# event study: outcomes aligned to each user's first purchase
# ---------------------------------------------------------------------------

_ES_HORIZON = 7


def _q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel event study: align every user's event stream to their
    FIRST purchase (relative day 0) and average event value by
    relative day over [-7, +7] — the standard around-the-treatment
    dynamics plot.  The anchor is a per-user conditional MIN window
    (no self-join); means are exact DECIMAL sums over integer counts
    with ONE double division.  Scale: one user-partitioned window +
    one 15-group hash aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        money("value").alias("v"),
    )
    wu = Window.partitionBy("user_id")
    anchored = ev.withColumn(
        "anchor",
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).over(wu),
    ).filter(F.col("anchor").isNotNull())
    rel = anchored.select(
        F.datediff("day", "anchor").alias("rel_day"), "v"
    ).filter(F.abs(F.col("rel_day")) <= _ES_HORIZON)
    return (
        rel.groupBy("rel_day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(
            F.col("rel_day").cast("int").alias("rel_day"),
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("s").cast(_D) / F.col("n").cast(_D), 6).alias("mean_value"),
        )
        .orderBy("rel_day")
    )


_SQL_EVENT_STUDY = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
), anchored AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN day END)
              OVER (PARTITION BY user_id) AS anchor
  FROM ev
), rel AS (
  SELECT CAST(date_diff('day', anchor, day) AS INT) AS rel_day, v
  FROM anchored
  WHERE anchor IS NOT NULL
    AND abs(date_diff('day', anchor, day)) <= {_ES_HORIZON}
)
SELECT rel_day, CAST(COUNT(*) AS BIGINT) AS n_events,
       round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
FROM rel GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# heterogeneous treatment effect by acctbal quintile
# ---------------------------------------------------------------------------


def _q_hte_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous treatment effect: per-customer total spend under
    the md5 A/B arm split, contrasted WITHIN acctbal quintiles — the
    segment-level uplift readout that follows any flat A/B result.
    Quintiles come from ntile over (acctbal, custkey) so membership is
    deterministic; spend sums stay exact DECIMAL (customers with no
    orders count as 0); each segment mean is one double division and
    the uplift subtracts the two means.  Scale: one orders rollup +
    broadcast-joined customer frame, one ntile window over customers,
    one 10-cell aggregate."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    spend = orders.groupBy("o_custkey").agg(
        F.sum(money("o_totalprice")).alias("spend")
    )
    seg = cust.select(
        "c_custkey",
        F.ntile(5)
        .over(Window.orderBy(money("c_acctbal"), "c_custkey"))
        .alias("segment"),
        F.when(
            F.substring(
                F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("hte"))), 1, 1
            ).isin(*list("01234567")),
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    joined = seg.join(spend, seg.c_custkey == spend.o_custkey, "left").select(
        "segment",
        "arm",
        F.coalesce("spend", F.lit(0).cast("decimal(18,2)")).alias("y"),
    )
    cells = joined.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == "A", F.col("y"))).alias("sa"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("arm") == "B", F.col("y"))).alias("sb"),
    )
    ma = F.col("sa").cast(_D) / F.col("na").cast(_D)
    mb = F.col("sb").cast(_D) / F.col("nb").cast(_D)
    return cells.select(
        F.col("segment").cast("int").alias("segment"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(ma - mb, 6).alias("uplift"),
    ).orderBy("segment")


_SQL_HTE_SEGMENTS = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY 1
), seg AS (
  SELECT c_custkey,
         NTILE(5) OVER (ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey) AS segment,
         CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR) || 'hte'), 1, 1)
              BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm
  FROM customer
), joined AS (
  SELECT segment, arm,
         COALESCE(spend, CAST(0 AS DECIMAL(18,2))) AS y
  FROM seg LEFT JOIN spend ON c_custkey = o_custkey
), cells AS (
  SELECT segment,
         SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN arm = 'A' THEN y END) AS sa,
         SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
         SUM(CASE WHEN arm = 'B' THEN y END) AS sb
  FROM joined GROUP BY 1
)
SELECT CAST(segment AS INT) AS segment,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 6) AS mean_a,
       round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS mean_b,
       round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS uplift
FROM cells
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# TOST equivalence test (two one-sided Welch t's)
# ---------------------------------------------------------------------------

_TOST_DELTA_CENTS = 100  # equivalence margin: +/- 1.00


def _q_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test between the 'view' and 'purchase' value
    means with margin +/-1.00: both one-sided Welch t statistics must
    clear 1.645 to declare equivalence — the A/B gate for 'prove
    NOTHING changed', the mirror image of q_ab_test's difference
    test.  Moments are exact integer CENTS; the two t's are
    identically-parenthesized double formulas sharing one Welch SE.
    Scale: one 6-moment events aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "event_type", (money("value") * 100).cast("long").alias("c")
    )
    mom = ev.agg(
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
    n1, n2 = F.col("n1").cast(_D), F.col("n2").cast(_D)
    m1 = F.col("s1").cast(_D) / n1 / 100.0
    m2 = F.col("s2").cast(_D) / n2 / 100.0
    v1 = (n1 * F.col("q1").cast(_D) - F.col("s1").cast(_D) * F.col("s1").cast(_D)) / (
        n1 * (n1 - 1.0)
    ) / 10000.0
    v2 = (n2 * F.col("q2").cast(_D) - F.col("s2").cast(_D) * F.col("s2").cast(_D)) / (
        n2 * (n2 - 1.0)
    ) / 10000.0
    se = F.sqrt(v1 / n1 + v2 / n2)
    delta = _TOST_DELTA_CENTS / 100.0
    diff = m1 - m2
    t_lower = (diff + delta) / se
    t_upper = (delta - diff) / se
    return mom.select(
        F.col("n1").cast("bigint").alias("n_view"),
        F.col("n2").cast("bigint").alias("n_purchase"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(se, 6).alias("welch_se"),
        F.round(t_lower, 6).alias("t_lower"),
        F.round(t_upper, 6).alias("t_upper"),
        (F.least(t_lower, t_upper) > 1.645).alias("equivalent"),
    )


_SQL_TOST = f"""
WITH ev AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM events WHERE event_type IN ('view', 'purchase')
), mom AS (
  SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN event_type = 'view' THEN c END) AS s1,
         SUM(CASE WHEN event_type = 'view' THEN c * c END) AS q1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN event_type = 'purchase' THEN c END) AS s2,
         SUM(CASE WHEN event_type = 'purchase' THEN c * c END) AS q2
  FROM ev
), t AS (
  SELECT CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0
         - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS diff,
         sqrt(((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / 10000.0
               / CAST(n1 AS DOUBLE))
              + ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                 / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) / 10000.0
                 / CAST(n2 AS DOUBLE))) AS se
  FROM mom
)
SELECT n_view, n_purchase,
       round(diff, 6) AS mean_diff,
       round(se, 6) AS welch_se,
       round((diff + {_TOST_DELTA_CENTS / 100.0}) / se, 6) AS t_lower,
       round(({_TOST_DELTA_CENTS / 100.0} - diff) / se, 6) AS t_upper,
       least((diff + {_TOST_DELTA_CENTS / 100.0}) / se,
             ({_TOST_DELTA_CENTS / 100.0} - diff) / se) > 1.645 AS equivalent
FROM t
"""


# ---------------------------------------------------------------------------
# sign-flip permutation test with md5-derived flips (no RNG)
# ---------------------------------------------------------------------------

_PERM_B = 64


def _q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign-flip permutation test on per-user (purchase - view)
    value totals: 64 deterministic md5-derived sign patterns stand in
    for random flips (the q_bootstrap_ci no-RNG convention), p =
    (1 + #{|sum_b| >= |observed|}) / (B + 1) — the distribution-free
    alternative to the paired t-test.  EVERYTHING is integer cents:
    each flipped sum and the observed sum are exact, so the extreme
    count is an integer compare.  Scale: one per-user aggregate, one
    x64 fan-out (documented fan-out class, like the bootstrap), one
    map-side-combined reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        (
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", money("value"))
                ),
                F.lit(0),
            )
            * 100
        )
        .cast("long")
        .alias("p"),
        (
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", money("value"))),
                F.lit(0),
            )
            * 100
        )
        .cast("long")
        .alias("v"),
    ).select("user_id", (F.col("p") - F.col("v")).alias("d"))
    obs = per_user.agg(
        F.count(F.lit(1)).alias("n"), F.sum("d").alias("obs")
    )
    bs = spark.range(1, _PERM_B + 1).select(F.col("id").alias("b"))
    flipped = per_user.crossJoin(F.broadcast(bs)).select(
        "b",
        (
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit("perm"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    1,
                ).isin(*list("02468ace")),
                F.col("d"),
            ).otherwise(-F.col("d"))
        ).alias("sd"),
    )
    stats = flipped.groupBy("b").agg(F.sum("sd").alias("stat"))
    extreme = stats.crossJoin(F.broadcast(obs)).agg(
        F.max("n").alias("n"),
        F.max("obs").alias("obs"),
        F.sum(
            (F.abs(F.col("stat")) >= F.abs(F.col("obs"))).cast("long")
        ).alias("n_extreme"),
    )
    return extreme.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(F.col("obs").cast(_D) / F.col("n").cast(_D) / 100.0, 6).alias(
            "obs_mean_diff"
        ),
        F.col("n_extreme").cast("bigint").alias("n_extreme"),
        F.round(
            (1.0 + F.col("n_extreme").cast(_D)) / F.lit(float(_PERM_B + 1)), 6
        ).alias("p_value"),
    )


_SQL_PERMUTATION_TEST = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT)
         - CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                          THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT)
         AS d
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
), obs AS (
  SELECT COUNT(*) AS n, SUM(d) AS obs FROM per_user
), bs AS (SELECT CAST(range AS BIGINT) AS b FROM range(1, {_PERM_B + 1})),
stats AS (
  SELECT b, SUM(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)
                            || 'perm' || CAST(b AS VARCHAR)), 1, 1)
                          IN ('0','2','4','6','8','a','c','e')
                     THEN d ELSE -d END) AS stat
  FROM per_user CROSS JOIN bs GROUP BY 1
)
SELECT CAST(o.n AS BIGINT) AS n_users,
       round(CAST(o.obs AS DOUBLE) / CAST(o.n AS DOUBLE) / 100.0, 6) AS obs_mean_diff,
       CAST(SUM(CASE WHEN abs(s.stat) >= abs(o.obs) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_extreme,
       round((1.0 + CAST(SUM(CASE WHEN abs(s.stat) >= abs(o.obs) THEN 1 ELSE 0 END)
                    AS DOUBLE)) / {float(_PERM_B + 1)}, 6) AS p_value
FROM stats s CROSS JOIN obs o
GROUP BY o.n, o.obs
"""


# ---------------------------------------------------------------------------
# seasonal strength of the hourly series (variance-explained ratio)
# ---------------------------------------------------------------------------


def _q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength of the hourly event-count series: 1 -
    var(residual)/var(total) after removing the hour-of-day profile —
    the STL-style forecastability score (complements q_seasonal's
    profile extraction with a single strength number).  The seasonal
    component is frozen to a round-6 DECIMAL mean per hour-of-day, so
    every residual y - s is an EXACT decimal and both variance
    numerators are exact decimal sums — only the final ratio is a
    double.  Scale: one events hash aggregate to the hourly grain,
    one 24-row profile aggregate, one broadcast join back."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        F.floor(F.unix_millis("ts") / F.lit(3600000.0)).cast("long").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.count(F.lit(1)).alias("y"))
    hod = hourly.select("h", "y", (F.col("h") % 24).alias("hod"))
    prof = hod.groupBy("hod").agg(
        F.round(F.sum("y").cast(_D) / F.count(F.lit(1)).cast(_D), 6)
        .cast("decimal(18,6)")
        .alias("s")
    )
    # residual in exact integer MICRO-units: y has scale 0, s scale 6,
    # so (y - s) * 1e6 is an exact integer; its square accumulates in
    # DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both exact.
    joined = hod.join(F.broadcast(prof), "hod").select(
        "y",
        ((F.col("y") - F.col("s")) * 1000000).cast("long").alias("rm"),
    )
    mom = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("rm").alias("sr"),
        F.sum(F.col("rm").cast("decimal(38,0)") * F.col("rm")).alias("srr"),
    )
    nd = F.col("n").cast(_D)
    var_tot = (nd * F.col("syy").cast(_D) - F.col("sy").cast(_D) * F.col("sy").cast(_D))
    var_res = (
        nd * F.col("srr").cast(_D) - F.col("sr").cast(_D) * F.col("sr").cast(_D)
    ) / 1e12
    strength = F.greatest(F.lit(0.0), 1.0 - var_res / var_tot)
    return mom.select(
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(var_tot / (nd * nd), 6).alias("var_total"),
        F.round(var_res / (nd * nd), 6).alias("var_resid"),
        F.round(strength, 6).alias("seasonal_strength"),
    )


_SQL_SEASONAL_STRENGTH = """
WITH hourly AS (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h, COUNT(*) AS y
  FROM events GROUP BY 1
), hod AS (
  SELECT h, y, h % 24 AS hod FROM hourly
), prof AS (
  SELECT hod, CAST(round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS DECIMAL(18,6)) AS s
  FROM hod GROUP BY 1
), joined AS (
  SELECT y, CAST((y - s) * 1000000 AS BIGINT) AS rm FROM hod JOIN prof USING (hod)
), mom AS (
  SELECT COUNT(*) AS n, SUM(y) AS sy,
         SUM(y * y) AS syy,
         SUM(rm) AS sr,
         SUM(CAST(rm AS HUGEINT) * rm) AS srr
  FROM joined
)
SELECT CAST(n AS BIGINT) AS n_hours,
       round((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_total,
       round(((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
               - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / 1e12)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_resid,
       round(greatest(0.0, 1.0 - ((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                                   - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / 1e12)
                                 / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS seasonal_strength
FROM mom
"""


SESSION6_QUERIES.extend(
    [
        QueryDef(
            "q_event_study", _q_event_study, _SQL_EVENT_STUDY,
            "event study aligned to first purchase",
        ),
        QueryDef(
            "q_hte_segments", _q_hte_segments, _SQL_HTE_SEGMENTS,
            "heterogeneous uplift by acctbal quintile",
        ),
        QueryDef(
            "q_tost", _q_tost, _SQL_TOST,
            "TOST equivalence test (two one-sided Welch t's)",
        ),
        QueryDef(
            "q_permutation_test", _q_permutation_test, _SQL_PERMUTATION_TEST,
            "md5 sign-flip permutation test, exact integer stats",
        ),
        QueryDef(
            "q_seasonal_strength", _q_seasonal_strength, _SQL_SEASONAL_STRENGTH,
            "STL-style seasonal strength (exact-decimal residual variance)",
        ),
    ]
)
