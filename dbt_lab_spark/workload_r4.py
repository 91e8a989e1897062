"""r4 additions: market-style time-bucket analytics (OHLCV candles,
Bollinger bands), retrieval/link-prediction metrics (MRR, Adamic-Adar),
distribution comparison (Jensen-Shannon divergence), and the Ljung-Box
portmanteau autocorrelation test.  Same (builder, oracle) contract as
dbt_lab_spark.workload.

Determinism conventions (see q_argmax / q_ndcg / q_link_pred / q_acf):
integer-cent money, min/max-of-struct arg-extremes with unique-key tie
breaks, transcendental terms frozen to round-6 DECIMAL(18,6) before any
accumulation (order-free sums), moment formulas with identical
parenthesization in both engines.

Reference capability evidence: the reference's aggregate + join + sort
physical operators (qexec/PhysicalOperators*.java); each query
re-expresses one distributed shape a user of that surface would build,
Spark-first.
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
# OHLCV candles: the time-bucket rollup every market/telemetry store does
# ---------------------------------------------------------------------------


def _q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLCV candles per event type: open/close are
    arg-extremes of (ts, event_id) via min/max-of-struct (ONE
    partial+final aggregate — no window, the q_argmax idiom), high/low/
    volume are plain extremes/sums of exact integer cents.  One shuffle
    on (event_type, hour); at any scale the state per group is one
    struct, so map-side combine collapses the fact table early."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["event_id", "event_type", "ts", "value"])
    ms = F.unix_millis(F.col("ts"))
    cents = (money("value") * 100).cast("long")
    pts = ev.select(
        "event_type",
        F.floor(ms / F.lit(3600000.0)).cast("long").alias("h"),
        ms.alias("ms"),
        "event_id",
        cents.alias("cents"),
    )
    g = pts.groupBy("event_type", "h").agg(
        F.min(F.struct("ms", "event_id", "cents")).alias("o"),
        F.max(F.struct("ms", "event_id", "cents")).alias("c"),
        F.max("cents").alias("hi"),
        F.min("cents").alias("lo"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("cents").alias("vol_cents"),
    )
    return g.select(
        "event_type",
        "h",
        (F.col("o.cents") / 100.0).alias("open"),
        (F.col("hi") / 100.0).alias("high"),
        (F.col("lo") / 100.0).alias("low"),
        (F.col("c.cents") / 100.0).alias("close"),
        "n_trades",
        (F.col("vol_cents") / 100.0).alias("volume"),
    ).orderBy("event_type", "h")


_SQL_OHLC = """
WITH pts AS (
  SELECT event_type,
         CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h,
         epoch_ms(ts) AS ms, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
)
SELECT event_type, h,
       (MIN({'a': ms, 'b': event_id, 'c': cents})).c / 100.0 AS open,
       MAX(cents) / 100.0 AS high,
       MIN(cents) / 100.0 AS low,
       (MAX({'a': ms, 'b': event_id, 'c': cents})).c / 100.0 AS close,
       COUNT(*) AS n_trades,
       SUM(cents) / 100.0 AS volume
FROM pts
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Bollinger bands: rolling mean +- 2 sigma over the daily value series
# ---------------------------------------------------------------------------


def _q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day Bollinger bands over the daily purchase-value series:
    rolling mean +- 2 sample standard deviations, full windows only.
    The window carries exact integer sums (cents and squared cents —
    DECIMAL(38,0) accumulator); mean/var/bands are double formulas with
    identical parenthesization both engines, so sqrt sees bit-equal
    input.  One shuffle (daily agg) + one ordered window."""
    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["ts", "event_type", "value"],
        predicates=[F.col("event_type") == "purchase"],
    )
    cents = (money("value") * 100).cast("long")
    daily = ev.groupBy(
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0)).cast("long").alias("d")
    ).agg(F.sum(cents).alias("x"))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    rolled = daily.select(
        "d",
        (F.col("x") / 100.0).alias("day_value"),
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("x").over(w).cast(_D).alias("sw"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).over(w).cast(_D).alias("sww"),
    ).filter(F.col("k") == 7)
    m = F.col("sw") / 7.0
    var = (7.0 * F.col("sww") - F.col("sw") * F.col("sw")) / (7.0 * 6.0)
    sd = F.sqrt(var)
    return rolled.select(
        "d",
        "day_value",
        (m / 100.0).alias("mean7"),
        ((m + 2.0 * sd) / 100.0).alias("upper"),
        ((m - 2.0 * sd) / 100.0).alias("lower"),
    ).orderBy("d")


_SQL_BOLLINGER = """
WITH daily AS (
  SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS d,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), rolled AS (
  SELECT d, x / 100.0 AS day_value,
         COUNT(*) OVER w AS k,
         CAST(SUM(x) OVER w AS DOUBLE) AS sw,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) OVER w AS DOUBLE) AS sww
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d, day_value,
       (sw / 7.0) / 100.0 AS mean7,
       ((sw / 7.0) + 2.0 * sqrt((7.0 * sww - sw * sw) / (7.0 * 6.0))) / 100.0 AS upper,
       ((sw / 7.0) - 2.0 * sqrt((7.0 * sww - sw * sw) / (7.0 * 6.0))) / 100.0 AS lower
FROM rolled WHERE k = 7
ORDER BY d
"""


# ---------------------------------------------------------------------------
# Mean reciprocal rank: the first-relevant-hit retrieval metric
# ---------------------------------------------------------------------------

_MRR_MIN_ORDERS = 5


def _q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of balance-ranked customer lists: each
    nation is a "query", its customers ranked by account balance, a
    customer is "relevant" when they placed >= 5 orders; MRR = mean of
    1/rank-of-first-relevant (0 for nations with no relevant customer —
    the standard convention).  Beside q_ndcg (graded, discounted) and
    q_auc_eval (threshold-free), this is the first-hit metric.  Each
    1/rank is frozen to DECIMAL(18,6) before the mean (order-free);
    ranks tie-break on c_custkey.  Scale: one orders rollup, one
    rank window partitioned by nation, one 25-row reduce."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = scan(spark, cat, "orders", ["o_custkey"])
    cnt = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    base = cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left").select(
        "c_nationkey",
        "c_custkey",
        money("c_acctbal").alias("bal"),
        (F.coalesce("n_orders", F.lit(0)) >= _MRR_MIN_ORDERS).alias("rel"),
    )
    ranked = base.select(
        "c_nationkey",
        "rel",
        F.row_number()
        .over(Window.partitionBy("c_nationkey").orderBy(F.desc("bal"), "c_custkey"))
        .alias("rnk"),
    )
    first_rel = ranked.filter("rel").groupBy("c_nationkey").agg(
        F.min("rnk").alias("first_rank")
    )
    n_nations = base.select("c_nationkey").distinct().count()
    rr = F.round(1.0 / F.col("first_rank").cast(_D), 6).cast("decimal(18,6)")
    return first_rel.agg(
        F.lit(n_nations).cast("bigint").alias("n_queries"),
        F.count(F.lit(1)).alias("n_with_relevant"),
        F.round(F.sum(rr).cast(_D) / F.lit(n_nations).cast(_D), 6).alias("mrr"),
    )


_SQL_MRR = f"""
WITH cnt AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1
), base AS (
  SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         COALESCE(n_orders, 0) >= {_MRR_MIN_ORDERS} AS rel
  FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
), ranked AS (
  SELECT c_nationkey, rel,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY bal DESC, c_custkey) AS rnk
  FROM base
), first_rel AS (
  SELECT c_nationkey, MIN(rnk) AS first_rank FROM ranked WHERE rel GROUP BY 1
), nq AS (
  SELECT COUNT(DISTINCT c_nationkey) AS n_queries FROM base
)
SELECT n_queries,
       (SELECT COUNT(*) FROM first_rel) AS n_with_relevant,
       round(CAST((SELECT SUM(CAST(round(1.0 / CAST(first_rank AS DOUBLE), 6)
                                   AS DECIMAL(18,6))) FROM first_rel) AS DOUBLE)
             / CAST(n_queries AS DOUBLE), 6) AS mrr
FROM nq
"""


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction on the trade graph
# ---------------------------------------------------------------------------

_AA_TOPK = 20


def _q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the undirected top-3 trade graph:
    for each NON-adjacent pair (u, v), AA(u,v) = sum over common
    neighbors z of 1/ln(deg(z)) — the log-degree-penalized variant
    beside q_link_pred's fully rational 1/deg.  Every common neighbor
    has deg >= 2 (it touches both u and v), so ln(deg) > 0.  Each
    1/ln(deg) is computed on an exactly-shared double and frozen to
    DECIMAL(18,6) before summation (order-free); top-20 tie-breaks on
    (score desc, u, v).  Scale: the same wedge enumeration bounded by
    sum(deg^2), never |V|^2."""
    from dbt_lab_spark.workload_extras import _trade_edges_topk

    edges = _trade_edges_topk(spark, sf_dir)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    adj = und.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        und.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = adj.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    wz = F.round(1.0 / F.log(F.col("deg").cast(_D)), 6).cast("decimal(18,6)")
    j1 = adj.select(F.col("x").alias("u"), F.col("y").alias("z"))
    j2 = adj.select(F.col("x").alias("z2"), F.col("y").alias("v"))
    wedges = j1.join(j2, j1.z == j2.z2).filter(F.col("u") < F.col("v"))
    cand = wedges.join(und, (wedges.u == und.a) & (wedges.v == und.b), "left_anti")
    scored = (
        cand.join(F.broadcast(deg.select(F.col("x").alias("z"), wz.alias("wz"))), "z")
        .groupBy("u", "v")
        .agg(F.sum("wz").alias("aa_dec"), F.count(F.lit(1)).alias("n_common"))
    )
    top = scored.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("aa_dec"), "u", "v"))
    ).filter(F.col("rn") <= _AA_TOPK)
    return top.select(
        "u", "v", "n_common",
        F.round(F.col("aa_dec").cast(_D), 6).alias("aa"),
        F.col("rn").alias("rank"),
    ).orderBy("rank")


def _sql_adamic_adar() -> str:
    from dbt_lab_spark.workload_extras import _SQL_TRADE_EDGES

    return f"""
WITH {_SQL_TRADE_EDGES},
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
),
adj AS (
  SELECT a AS x, b AS y FROM und UNION ALL SELECT b AS x, a AS y FROM und
),
deg AS (
  SELECT x, COUNT(*) AS deg FROM adj GROUP BY 1
),
wedges AS (
  SELECT j1.y AS z, j1.x AS u, j2.x AS v
  FROM adj j1 JOIN adj j2 ON j1.y = j2.y AND j1.x < j2.x
),
cand AS (
  SELECT w.u, w.v, w.z FROM wedges w
  ANTI JOIN und ON w.u = und.a AND w.v = und.b
),
scored AS (
  SELECT u, v,
         SUM(CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 6) AS DECIMAL(18,6))) AS aa_dec,
         COUNT(*) AS n_common
  FROM cand JOIN deg ON cand.z = deg.x
  GROUP BY 1, 2
),
top AS (
  SELECT u, v, n_common, aa_dec,
         ROW_NUMBER() OVER (ORDER BY aa_dec DESC, u, v) AS rank
  FROM scored
)
SELECT u, v, n_common, round(CAST(aa_dec AS DOUBLE), 6) AS aa, rank
FROM top WHERE rank <= {_AA_TOPK}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between the sources' unigram distributions
# ---------------------------------------------------------------------------


def _q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the per-source
    unigram distributions of the documents table — the symmetric,
    bounded drift measure beside q_kl_drift's directed KL.  For each
    source pair and token, p and q are exact-count ratios (identical
    doubles both engines); each p*ln(p/m) term (m = (p+q)/2) is frozen
    to DECIMAL(18,6) before the order-free sum.  Scale: one token
    count shuffle bounded by |vocab| x |sources|, then a tiny
    vocab-level pair join."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["source", "text"])
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    cnt = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    dist = cnt.join(tot, "source").select(
        "source", "token", (F.col("c").cast(_D) / F.col("t").cast(_D)).alias("p")
    )
    # Build the (s1, s2, token) grid explicitly: every source pair x
    # every token, with each side's probability (0 when absent) — the
    # union-of-supports JSD needs both marginals at every token.
    srcs = dist.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("s1"))
        .crossJoin(srcs.select(F.col("source").alias("s2")))
        .filter(F.col("s1") < F.col("s2"))
    )
    toks_all = dist.select("token").distinct()
    grid = pairs.crossJoin(toks_all)
    withp = (
        grid.join(
            dist.select(F.col("source").alias("s1"), "token", F.col("p").alias("p1")),
            ["s1", "token"],
            "left",
        )
        .join(
            dist.select(F.col("source").alias("s2"), "token", F.col("p").alias("p2")),
            ["s2", "token"],
            "left",
        )
        .select(
            "s1",
            "s2",
            F.coalesce("p1", F.lit(0.0)).alias("p1"),
            F.coalesce("p2", F.lit(0.0)).alias("p2"),
        )
        .filter((F.col("p1") > 0) | (F.col("p2") > 0))
    )
    m = (F.col("p1") + F.col("p2")) / 2.0
    term1 = F.when(
        F.col("p1") > 0,
        F.round(F.col("p1") * F.log(F.col("p1") / m), 6).cast("decimal(18,6)"),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    term2 = F.when(
        F.col("p2") > 0,
        F.round(F.col("p2") * F.log(F.col("p2") / m), 6).cast("decimal(18,6)"),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    return (
        withp.select("s1", "s2", term1.alias("t1"), term2.alias("t2"))
        .groupBy("s1", "s2")
        .agg(
            F.round(
                (0.5 * F.sum("t1").cast(_D)) + (0.5 * F.sum("t2").cast(_D)), 6
            ).alias("jsd")
        )
        .orderBy("s1", "s2")
    )


_SQL_JS_DIVERGENCE = r"""
WITH toks AS (
  SELECT source, token
  FROM documents, UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS u(token)
  WHERE token <> ''
), cnt AS (
  SELECT source, token, COUNT(*) AS c FROM toks GROUP BY 1, 2
), tot AS (
  SELECT source, SUM(c) AS t FROM cnt GROUP BY 1
), dist AS (
  SELECT cnt.source, token, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
  FROM cnt JOIN tot ON cnt.source = tot.source
), pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM (SELECT DISTINCT source FROM dist) a,
       (SELECT DISTINCT source FROM dist) b
  WHERE a.source < b.source
), grid AS (
  SELECT s1, s2, token FROM pairs, (SELECT DISTINCT token FROM dist) t
), withp AS (
  SELECT g.s1, g.s2,
         COALESCE(d1.p, 0.0) AS p1,
         COALESCE(d2.p, 0.0) AS p2
  FROM grid g
  LEFT JOIN dist d1 ON d1.source = g.s1 AND d1.token = g.token
  LEFT JOIN dist d2 ON d2.source = g.s2 AND d2.token = g.token
  WHERE COALESCE(d1.p, 0.0) > 0 OR COALESCE(d2.p, 0.0) > 0
)
SELECT s1, s2,
       round(0.5 * CAST(SUM(CASE WHEN p1 > 0 THEN CAST(round(p1 * ln(p1 / ((p1 + p2) / 2.0)), 6) AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           + 0.5 * CAST(SUM(CASE WHEN p2 > 0 THEN CAST(round(p2 * ln(p2 / ((p1 + p2) / 2.0)), 6) AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS jsd
FROM withp
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test on the hourly event-count series
# ---------------------------------------------------------------------------

_LB_LAGS = 6


def _q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q statistic (m=6 lags) on the hourly event-count
    series: Q = n(n+2) * sum_k r_k^2/(n-k), with the STANDARD
    fixed-mean autocorrelation estimator r_k (global x-bar, full-series
    denominator) — the whiteness test run on residuals before trusting
    a forecating model, beside q_acf's per-lag Pearson view.  All
    sums are exact integers (counts); r_k is a double formula with
    identical parenthesization; each r_k^2/(n-k) term is frozen to
    DECIMAL(18,6) before the sum.  One hourly aggregate, one ordered
    lead window, one 1-row reduce."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["ts"])
    hourly = (
        ev.groupBy(
            F.floor(F.unix_millis(F.col("ts")) / F.lit(3600000.0)).cast("long").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("h")
    lead_cols = [F.lead("x", k).over(w).alias(f"y{k}") for k in range(1, _LB_LAGS + 1)]
    frame = hourly.select("x", *lead_cols)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    ]
    for k in range(1, _LB_LAGS + 1):
        y = F.col(f"y{k}")
        cond = y.isNotNull()
        aggs += [
            F.sum(F.when(cond, F.col("x").cast("decimal(38,0)") * y)).alias(f"sxy{k}"),
            F.sum(F.when(cond, F.col("x"))).alias(f"sa{k}"),
            F.sum(F.when(cond, y)).alias(f"sb{k}"),
        ]
    mrow = frame.agg(*aggs)
    n = F.col("n").cast(_D)
    xbar = F.col("sx").cast(_D) / n
    den = F.col("sxx").cast(_D) - n * xbar * xbar
    terms = []
    for k in range(1, _LB_LAGS + 1):
        nk = n - F.lit(float(k))
        num = (
            F.col(f"sxy{k}").cast(_D)
            - xbar * (F.col(f"sa{k}").cast(_D) + F.col(f"sb{k}").cast(_D))
            + nk * xbar * xbar
        )
        r = num / den
        terms.append(F.round(r * r / nk, 6).cast("decimal(18,6)"))
    ssum = terms[0]
    for t in terms[1:]:
        ssum = ssum + t
    return mrow.select(
        F.col("n").cast("bigint").alias("n_buckets"),
        F.lit(_LB_LAGS).cast("int").alias("m_lags"),
        F.round(n * (n + 2.0) * ssum.cast(_D), 4).alias("q_stat"),
    )


def _sql_ljung_box() -> str:
    sxy = ", ".join(
        f"SUM(CASE WHEN y{k} IS NOT NULL THEN CAST(x AS DECIMAL(38,0)) * y{k} END) AS sxy{k}, "
        f"SUM(CASE WHEN y{k} IS NOT NULL THEN x END) AS sa{k}, "
        f"SUM(CASE WHEN y{k} IS NOT NULL THEN y{k} END) AS sb{k}"
        for k in range(1, _LB_LAGS + 1)
    )
    leads = ", ".join(
        f"LEAD(x, {k}) OVER (ORDER BY h) AS y{k}" for k in range(1, _LB_LAGS + 1)
    )
    term = " + ".join(
        "CAST(round(((CAST(sxy{k} AS DOUBLE)"
        " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sa{k} AS DOUBLE) + CAST(sb{k} AS DOUBLE))"
        " + (CAST(n AS DOUBLE) - {kf}) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))"
        " / (CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))"
        " * ((CAST(sxy{k} AS DOUBLE)"
        " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sa{k} AS DOUBLE) + CAST(sb{k} AS DOUBLE))"
        " + (CAST(n AS DOUBLE) - {kf}) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))"
        " / (CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))"
        " / (CAST(n AS DOUBLE) - {kf}), 6) AS DECIMAL(18,6))".format(k=k, kf=f"{float(k)}")
        for k in range(1, _LB_LAGS + 1)
    )
    return f"""
WITH hourly AS (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h, COUNT(*) AS x
  FROM events GROUP BY 1
), frame AS (
  SELECT x, {leads} FROM hourly
), mom AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx, {sxy}
  FROM frame
)
SELECT CAST(n AS BIGINT) AS n_buckets,
       CAST({_LB_LAGS} AS INT) AS m_lags,
       round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
             * CAST(({term}) AS DOUBLE), 4) AS q_stat
FROM mom
"""


R4_QUERIES: list[QueryDef] = [
    QueryDef("q_ohlc", _q_ohlc, _SQL_OHLC, "hourly OHLCV candles per event type"),
    QueryDef("q_bollinger", _q_bollinger, _SQL_BOLLINGER, "7-day Bollinger bands"),
    QueryDef("q_mrr", _q_mrr, _SQL_MRR, "mean reciprocal rank per nation-query"),
    QueryDef(
        "q_adamic_adar", _q_adamic_adar, _sql_adamic_adar(),
        "Adamic-Adar link prediction top-20",
    ),
    QueryDef(
        "q_js_divergence", _q_js_divergence, _SQL_JS_DIVERGENCE,
        "pairwise Jensen-Shannon divergence between sources",
    ),
    QueryDef(
        "q_ljung_box", _q_ljung_box, _sql_ljung_box(),
        "Ljung-Box portmanteau autocorrelation test",
    ),
]
