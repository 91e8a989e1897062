"""r3 session-5 additions: rank/order statistics (Mann-Whitney U,
Benjamini-Hochberg FDR), interval analytics (sweep-line concurrency,
max drawdown, gaps-and-islands streaks), information-theoretic feature
association (mutual information), graph link prediction (resource
allocation index), and time-series change-point detection.  Same
(builder, oracle) contract as dbt_lab_spark.workload.

Reference capability evidence, cited per query: the reference's
iterative/bulk surface is the Hadoop bulk-operator extension point
(mapred/qexec/examples/CountTuplesOperator.java:36-67) and its join +
aggregate physical operators (qexec/PhysicalOperators*.java); each
query here re-expresses one distributed shape a user of that surface
would build, Spark-first.

Determinism: every query follows the repo's cross-engine exactness
conventions — integer/decimal arithmetic end-to-end where possible,
frozen-ln DECIMAL(18,6) terms for transcendentals, identical
double-formula parenthesization in both engines, and deterministic
tie-breaks on every top-k / argmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef
from dbt_lab_spark.workload_extras import _SQL_TRADE_EDGES, _trade_edges_topk

_D = "double"


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test — integer-rational, tie-corrected
# ---------------------------------------------------------------------------


def _q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U between 'view' and 'purchase' event
    values — the rank-based location test next to q_ks_test's
    distribution-shape test.  ENTIRELY integer until the final z:
    compress to per-distinct-value counts (DECIMAL(18,2) canonical
    domain), one cumulative window, and the doubled rank-sum
    2*R1 = sum_v a_v * (2*before_v + t_v + 1) is an exact integer
    (ties get the doubled average rank 2*before + t + 1).  The
    tie-corrected z uses one identically-parenthesized double formula
    in both engines.  Scale: the window runs over the compressed value
    domain (|distinct money values|), never the raw event count."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("event_type", money("value").alias("v"))
    per_v = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
        )
        .withColumn("t", F.col("a") + F.col("b"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "a", "b", "t", (F.sum("t").over(w) - F.col("t")).alias("before")
    )
    red = cum.agg(
        F.sum(F.col("a") * (2 * F.col("before") + F.col("t") + 1)).alias("two_r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum"),
        F.sum("a").alias("n1"),
        F.sum("b").alias("n2"),
    )
    n1d = F.col("n1").cast(_D)
    n2d = F.col("n2").cast(_D)
    nd = (F.col("n1") + F.col("n2")).cast(_D)
    var = (n1d * n2d / F.lit(12.0)) * (
        (nd + F.lit(1.0))
        - F.col("tie_sum").cast(_D) / (nd * (nd - F.lit(1.0)))
    )
    two_u1 = F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    return red.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        two_u1.cast("bigint").alias("two_u1"),
        (2 * F.col("n1") * F.col("n2") - two_u1).cast("bigint").alias("two_u2"),
        F.col("tie_sum").cast("bigint").alias("tie_sum"),
        F.round(
            (two_u1 - F.col("n1") * F.col("n2")).cast(_D) / (F.lit(2.0) * F.sqrt(var)),
            6,
        ).alias("z_stat"),
    )


_SQL_MANN_WHITNEY = """
WITH per_v AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b,
         COUNT(*) AS t
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
), cum AS (
  SELECT a, b, t,
         SUM(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t AS bef
  FROM per_v
), red AS (
  SELECT SUM(a * (2 * bef + t + 1)) AS two_r1,
         SUM(t * t * t - t) AS tie_sum,
         SUM(a) AS n1, SUM(b) AS n2
  FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1,
       CAST(2 * n1 * n2 - (two_r1 - n1 * (n1 + 1)) AS BIGINT) AS two_u2,
       CAST(tie_sum AS BIGINT) AS tie_sum,
       round(CAST((two_r1 - n1 * (n1 + 1)) - n1 * n2 AS DOUBLE)
             / (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                   - CAST(tie_sum AS DOUBLE)
                     / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0))))),
             6) AS z_stat
FROM red
"""


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR step-up over per-source Chebyshev p-values
# ---------------------------------------------------------------------------

_BH_ALPHA_X10 = 1  # alpha = 0.1; the step-up compare is p * 10 * m <= k


def _q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control: per documents-source location test
    against the corpus mean of n_chars, then the Benjamini-Hochberg
    step-up at alpha=0.1.  The per-source p-value is the Chebyshev
    bound p = min(1, 1/z^2) — a valid conservative p-value that is
    fully RATIONAL (no erf/чи2 CDF), so both engines agree exactly.
    The step-up comparison p_(k) <= k*alpha/m runs in exact decimal
    (p frozen to DECIMAL(18,6); compare p*10*m <= k with alpha=0.1),
    never a float threshold.  Rank ties break on source name.
    Scale: one hash aggregate over documents + an m-row window."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["source", "n_chars"])
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("n_chars").alias("sx_g")
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    j = g.crossJoin(F.broadcast(tot))
    mean_g = F.col("sx_g").cast(_D) / F.col("n_g").cast(_D)
    mean_all = F.col("sx").cast(_D) / F.col("n").cast(_D)
    var_all = (
        F.col("n").cast(_D) * F.col("sxx").cast(_D)
        - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    ) / (F.col("n").cast(_D) * (F.col("n").cast(_D) - F.lit(1.0)))
    z2 = (mean_g - mean_all) * (mean_g - mean_all) * F.col("n_g").cast(_D) / var_all
    p = F.when(z2 <= F.lit(0.0), F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), F.lit(1.0) / z2)
    )
    scored = j.select(
        "source",
        F.col("n_g").cast("bigint").alias("n_docs"),
        F.round(p, 6).cast("decimal(18,6)").alias("p_dec"),
    )
    wk = Window.orderBy("p_dec", "source")
    wall = Window.partitionBy()
    ranked = scored.select(
        "source",
        "n_docs",
        "p_dec",
        F.row_number().over(wk).alias("k_rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    flagged = ranked.withColumn(
        "ok", F.col("p_dec") * F.lit(10 * _BH_ALPHA_X10) * F.col("m") <= F.col("k_rank")
    )
    kmax = F.max(F.when(F.col("ok"), F.col("k_rank"))).over(wall)
    return flagged.select(
        "source",
        "n_docs",
        F.col("p_dec").cast(_D).alias("p_cheb"),
        F.col("k_rank").cast("int").alias("k_rank"),
        (F.col("k_rank") <= F.coalesce(kmax, F.lit(0))).alias("rejected"),
    )


_SQL_BH_FDR = f"""
WITH g AS (
  SELECT source, COUNT(*) AS n_g, SUM(n_chars) AS sx_g
  FROM documents GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS n, SUM(n_chars) AS sx, SUM(n_chars * n_chars) AS sxx
  FROM documents
), scored AS (
  SELECT source, CAST(n_g AS BIGINT) AS n_docs,
         CAST(round(CASE WHEN
             (CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE)
              - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * CAST(n_g AS DOUBLE)
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) <= 0.0
           THEN 1.0
           ELSE least(1.0, 1.0 / (
             (CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE)
              - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * CAST(n_g AS DOUBLE)
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))))
         END, 6) AS DECIMAL(18,6)) AS p_dec
  FROM g, tot
), ranked AS (
  SELECT source, n_docs, p_dec,
         ROW_NUMBER() OVER (ORDER BY p_dec, source) AS k_rank,
         COUNT(*) OVER () AS m
  FROM scored
), flagged AS (
  SELECT source, n_docs, p_dec, k_rank,
         p_dec * {10 * _BH_ALPHA_X10} * m <= k_rank AS ok
  FROM ranked
)
SELECT source, n_docs, CAST(p_dec AS DOUBLE) AS p_cheb,
       CAST(k_rank AS INT) AS k_rank,
       k_rank <= COALESCE(MAX(CASE WHEN ok THEN k_rank END) OVER (), 0) AS rejected
FROM flagged
"""


# ---------------------------------------------------------------------------
# sweep-line interval concurrency (max open orders per priority)
# ---------------------------------------------------------------------------


def _q_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak resource concurrency via the sweep-line: each order is an
    interval [o_orderdate, max(l_shipdate)) — half-open, so an order
    closing at t frees capacity before one opening at t takes it.
    Emit +1/-1 boundary points, COLLAPSE duplicate (ts, delta) points
    with a count (this makes every running-sum prefix deterministic —
    ungrouped equal sort keys would give order-dependent partial
    sums), one running sum per priority, argmax with a min-ts
    tie-break.  Exact integers end-to-end.  Scale: the sweep is a
    keyed window over collapsed boundary points (<= 2 per distinct
    timestamp), partitioned by priority."""
    cat = Catalog(sf_dir)
    orders = scan(
        spark, cat, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"]
    )
    li = scan(spark, cat, "lineitem", ["l_orderkey", "l_shipdate"])
    ends = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("end_ts"))
    iv = (
        orders.join(ends, orders.o_orderkey == ends.l_orderkey)
        .select(
            "o_orderpriority",
            F.col("o_orderdate").alias("start_ts"),
            "end_ts",
        )
        # a generator quirk can put the last shipdate at/before the order
        # date; such empty/negative intervals occupy no time under the
        # half-open convention, but their -1 would land BEFORE their +1
        # in the sweep and corrupt every prefix in between — drop them.
        .filter(F.col("end_ts") > F.col("start_ts"))
    )
    points = (
        iv.select(
            "o_orderpriority", F.col("start_ts").alias("ts"), F.lit(1).alias("delta")
        )
        .unionAll(
            iv.select(
                "o_orderpriority", F.col("end_ts").alias("ts"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("o_orderpriority", "ts", "delta")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = points.withColumn("run", F.sum(F.col("delta") * F.col("cnt")).over(w))
    mc = F.max("run").over(Window.partitionBy("o_orderpriority"))
    flagged = run.withColumn("mc", mc)
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.max("run").cast("bigint").alias("max_concurrent"),
            F.min(F.when(F.col("run") == F.col("mc"), F.col("ts"))).alias("peak_ts"),
            F.sum(F.when(F.col("delta") == 1, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


_SQL_MAX_CONCURRENT = """
WITH ends AS (
  SELECT l_orderkey, MAX(l_shipdate) AS end_ts FROM lineitem GROUP BY 1
), iv AS (
  SELECT o_orderpriority, o_orderdate AS start_ts, end_ts
  FROM orders JOIN ends ON o_orderkey = l_orderkey
  WHERE end_ts > o_orderdate
), points AS (
  SELECT o_orderpriority, ts, delta, COUNT(*) AS cnt FROM (
    SELECT o_orderpriority, start_ts AS ts, 1 AS delta FROM iv
    UNION ALL
    SELECT o_orderpriority, end_ts AS ts, -1 AS delta FROM iv
  ) GROUP BY 1, 2, 3
), sweep AS (
  SELECT o_orderpriority, ts, delta, cnt,
         SUM(delta * cnt) OVER (PARTITION BY o_orderpriority
                                ORDER BY ts, delta
                                ROWS UNBOUNDED PRECEDING) AS run
  FROM points
), flagged AS (
  SELECT *, MAX(run) OVER (PARTITION BY o_orderpriority) AS mc FROM sweep
)
SELECT o_orderpriority,
       CAST(MAX(run) AS BIGINT) AS max_concurrent,
       MIN(CASE WHEN run = mc THEN ts END) AS peak_ts,
       CAST(SUM(CASE WHEN delta = 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_orders
FROM flagged
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# maximum drawdown of cumulative daily revenue (exact decimal)
# ---------------------------------------------------------------------------


def _q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the DEMEANED cumulative daily-revenue curve
    (cumulative revenue minus the average-pace line k*mean_daily) —
    the path-dependent "how far behind the average pace did we fall"
    risk statistic q_cusum's mean-shift detector doesn't capture.
    (Raw cumulative revenue is monotone, so its drawdown is
    identically 0 — the demeaned curve is the one that excursions.)
    EXACT arithmetic throughout: daily sums in integer CENTS, and the
    demeaned value is scaled through n_days —
    s_k = n_days*cum_k - k*total — so no division happens before the
    final double outputs; the trough argmax tie-breaks on the earliest
    day.  Scale: windows run over the per-day rollup (|days|), never
    raw orders."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderdate", "o_totalprice"])
    daily = (
        orders.select(
            F.date_trunc("day", "o_orderdate").cast("date").alias("d"),
            money("o_totalprice").alias("rev"),
        )
        .groupBy("d")
        .agg((F.sum("rev") * 100).cast("long").alias("rev_c"))
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    wins = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).alias("k"),
        F.sum("rev_c").over(wc).alias("cum_c"),
        F.sum("rev_c").over(wall).alias("tot_c"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    ).withColumn(
        "s", F.col("n_days") * F.col("cum_c") - F.col("k") * F.col("tot_c")
    )
    dd = wins.select(
        "d", "s", "n_days", F.max("s").over(wc).alias("peak")
    ).withColumn("drawdown", F.col("peak") - F.col("s"))
    mdd = dd.withColumn("mdd", F.max("drawdown").over(wall))
    scale = F.lit(100.0) * F.col("n_days").cast(_D)
    return (
        mdd.filter(F.col("drawdown") == F.col("mdd"))
        .orderBy("d")
        .limit(1)
        .select(
            F.col("d").alias("trough_day"),
            F.round(F.col("drawdown").cast(_D) / scale, 4).alias("max_drawdown"),
            F.round(F.col("peak").cast(_D) / scale, 4).alias("peak_demeaned"),
            F.round(F.col("s").cast(_D) / scale, 4).alias("demeaned_at_trough"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


_SQL_DRAWDOWN = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
), wins AS (
  SELECT d,
         ROW_NUMBER() OVER (ORDER BY d) AS k,
         SUM(rev_c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum_c,
         SUM(rev_c) OVER () AS tot_c,
         COUNT(*) OVER () AS n_days
  FROM daily
), dm AS (
  SELECT d, n_days, n_days * cum_c - k * tot_c AS s FROM wins
), dd AS (
  SELECT d, s, n_days,
         MAX(s) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
  FROM dm
), scored AS (
  SELECT d, s, peak, n_days, peak - s AS drawdown,
         MAX(peak - s) OVER () AS mdd
  FROM dd
)
SELECT d AS trough_day,
       round(CAST(drawdown AS DOUBLE) / (100.0 * CAST(n_days AS DOUBLE)), 4)
         AS max_drawdown,
       round(CAST(peak AS DOUBLE) / (100.0 * CAST(n_days AS DOUBLE)), 4)
         AS peak_demeaned,
       round(CAST(s AS DOUBLE) / (100.0 * CAST(n_days AS DOUBLE)), 4)
         AS demeaned_at_trough,
       CAST(n_days AS BIGINT) AS n_days
FROM scored WHERE drawdown = mdd ORDER BY d LIMIT 1
"""


# ---------------------------------------------------------------------------
# link prediction: resource-allocation index over the trade graph
# ---------------------------------------------------------------------------

_RA_TOPK = 20


def _q_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction on the undirected top-3
    trade graph: for each NON-adjacent pair (u, v), RA(u,v) =
    sum_{z in N(u) ∩ N(v)} 1/deg(z) — the degree-penalized
    common-neighbor score (Zhou et al. 2009); Adamic-Adar's 1/log deg
    swapped for the fully RATIONAL 1/deg.  Determinism: each 1/deg is
    frozen to DECIMAL(18,6) before summation (exact, associative);
    top-20 tie-breaks on (score desc, u, v).  Scale: two self-joins of
    the adjacency list keyed on the shared neighbor — the standard
    distributed wedge enumeration, bounded by sum(deg^2), never
    |V|^2."""
    edges = _trade_edges_topk(spark, sf_dir)
    nation = scan(spark, Catalog(sf_dir), "nation", ["n_nationkey", "n_name"])
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
    wz = F.round(F.lit(1.0) / F.col("deg").cast(_D), 6).cast("decimal(18,6)")
    j1 = adj.select(F.col("x").alias("u"), F.col("y").alias("z"))
    j2 = adj.select(F.col("x").alias("z2"), F.col("y").alias("v"))
    wedges = j1.join(j2, j1.z == j2.z2).filter(F.col("u") < F.col("v"))
    cand = wedges.join(
        und, (wedges.u == und.a) & (wedges.v == und.b), "left_anti"
    )
    scored = (
        cand.join(F.broadcast(deg.select(F.col("x").alias("z"), wz.alias("wz"))), "z")
        .groupBy("u", "v")
        .agg(
            F.sum("wz").alias("ra"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    top = scored.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("ra"), "u", "v"))
    ).filter(F.col("rn") <= _RA_TOPK)
    nu = nation.select(
        F.col("n_nationkey").alias("u"), F.col("n_name").alias("u_name")
    )
    nv = nation.select(
        F.col("n_nationkey").alias("v"), F.col("n_name").alias("v_name")
    )
    return (
        top.join(F.broadcast(nu), "u")
        .join(F.broadcast(nv), "v")
        .select(
            "u_name",
            "v_name",
            F.col("ra").cast(_D).alias("ra_score"),
            F.col("n_common").cast("bigint").alias("n_common"),
        )
        .orderBy(F.desc("ra_score"), "u_name", "v_name")
    )


_SQL_LINK_PRED = rf"""
WITH {_SQL_TRADE_EDGES},
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
), adj AS MATERIALIZED (
  SELECT a AS x, b AS y FROM und
  UNION ALL
  SELECT b AS x, a AS y FROM und
), deg AS (
  SELECT x, CAST(round(1.0 / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS wz
  FROM adj GROUP BY 1
), wedges AS (
  SELECT j1.x AS u, j2.y AS v, j1.y AS z
  FROM adj j1 JOIN adj j2 ON j1.y = j2.x
  WHERE j1.x < j2.y
), cand AS (
  SELECT w.u, w.v, w.z FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = w.u AND e.b = w.v)
), scored AS (
  SELECT c.u, c.v, SUM(d.wz) AS ra, COUNT(*) AS n_common
  FROM cand c JOIN deg d ON d.x = c.z
  GROUP BY 1, 2
), top AS (
  SELECT u, v, ra, n_common,
         ROW_NUMBER() OVER (ORDER BY ra DESC, u, v) AS rn
  FROM scored
)
SELECT nu.n_name AS u_name, nv.n_name AS v_name,
       CAST(ra AS DOUBLE) AS ra_score, CAST(n_common AS BIGINT) AS n_common
FROM top
JOIN nation nu ON nu.n_nationkey = u
JOIN nation nv ON nv.n_nationkey = v
WHERE rn <= {_RA_TOPK}
ORDER BY ra_score DESC, u_name, v_name
"""


# ---------------------------------------------------------------------------
# mutual information between customer nation and order priority
# ---------------------------------------------------------------------------


def _q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between customer nation and order
    priority — the feature-association score a training pipeline uses
    for feature selection, with both marginal entropies and the
    normalized MI.  Frozen-ln convention: each ln runs on an
    identically-parenthesized double of exact integer counts, rounds
    to 6, freezes to DECIMAL(18,6), is weighted by the INTEGER cell
    count and summed exactly; one double division at the end.  Scale:
    one (nation, priority) hash aggregate, tiny marginal reduces, all
    joint work broadcast."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_orderpriority"])
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey"])
    cell = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rx = cell.groupBy("c_nationkey").agg(F.sum("c").alias("r"))
    cy = cell.groupBy("o_orderpriority").agg(F.sum("c").alias("cc"))
    tot = cell.agg(F.sum("c").alias("n"))

    def frozen_ln(arg):
        return F.round(F.log(arg), 6).cast("decimal(18,6)")

    mi_term = F.col("c") * frozen_ln(
        (F.col("c").cast(_D) * F.col("n").cast(_D))
        / (F.col("r").cast(_D) * F.col("cc").cast(_D))
    )
    mi = (
        cell.join(F.broadcast(rx), "c_nationkey")
        .join(F.broadcast(cy), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(mi_term).cast(_D) / F.max("n"), 6).alias("mi_nats"),
            F.max("n").cast("bigint").alias("n_orders"),
        )
    )
    hx = (
        rx.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum(
                    F.col("r") * frozen_ln(F.col("r").cast(_D) / F.col("n").cast(_D))
                ).cast(_D)
                / F.max("n"),
                6,
            ).alias("h_nation")
        )
    )
    hy = (
        cy.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum(
                    F.col("cc") * frozen_ln(F.col("cc").cast(_D) / F.col("n").cast(_D))
                ).cast(_D)
                / F.max("n"),
                6,
            ).alias("h_priority")
        )
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "mi_nats",
            "h_nation",
            "h_priority",
            F.round(
                F.col("mi_nats") / F.sqrt(F.col("h_nation") * F.col("h_priority")), 6
            ).alias("nmi"),
            "n_orders",
        )
    )


_SQL_MUTUAL_INFO = """
WITH cell AS MATERIALIZED (
  SELECT c_nationkey, o_orderpriority, COUNT(*) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), rx AS (
  SELECT c_nationkey, SUM(c) AS r FROM cell GROUP BY 1
), cy AS (
  SELECT o_orderpriority, SUM(c) AS cc FROM cell GROUP BY 1
), tot AS (
  SELECT SUM(c) AS n FROM cell
), mi AS (
  SELECT round(CAST(SUM(c * CAST(round(ln(
             (CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
             / (CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))), 6) AS DECIMAL(18,6)))
         AS DOUBLE) / MAX(n), 6) AS mi_nats,
         CAST(MAX(n) AS BIGINT) AS n_orders
  FROM cell
  JOIN rx USING (c_nationkey)
  JOIN cy USING (o_orderpriority)
  CROSS JOIN tot
), hx AS (
  SELECT round(-CAST(SUM(r * CAST(round(ln(
             CAST(r AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)))
         AS DOUBLE) / MAX(n), 6) AS h_nation
  FROM rx CROSS JOIN tot
), hy AS (
  SELECT round(-CAST(SUM(cc * CAST(round(ln(
             CAST(cc AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)))
         AS DOUBLE) / MAX(n), 6) AS h_priority
  FROM cy CROSS JOIN tot
)
SELECT mi_nats, h_nation, h_priority,
       round(mi_nats / sqrt(h_nation * h_priority), 6) AS nmi, n_orders
FROM mi CROSS JOIN hx CROSS JOIN hy
"""


# ---------------------------------------------------------------------------
# gaps-and-islands: longest consecutive-day activity streaks
# ---------------------------------------------------------------------------

_STREAK_TOPK = 20


def _q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, top-20 — the
    gaps-and-islands engagement metric.  The classic day_int minus
    row_number island key (exact integers), per-user best streak with
    an earliest-start tie-break, global top-20 tie-broken on user_id.
    Scale: one distinct (user, day) aggregate, then user-partitioned
    windows over per-user day counts."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    di = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    wd = Window.partitionBy("user_id").orderBy("d")
    isl = ev.select(
        "user_id", "d", (di - F.row_number().over(wd)).alias("island")
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start_d")
    )
    wbest = Window.partitionBy("user_id").orderBy(F.desc("len"), "start_d")
    best = runs.withColumn("rn", F.row_number().over(wbest)).filter(F.col("rn") == 1)
    wtop = Window.orderBy(F.desc("len"), "user_id")
    return (
        best.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= _STREAK_TOPK)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("len").cast("bigint").alias("streak_days"),
            F.col("start_d").alias("streak_start"),
        )
        .orderBy(F.desc("streak_days"), "user_id")
    )


_SQL_STREAKS = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), isl AS (
  SELECT user_id, d,
         date_diff('day', DATE '1970-01-01', d)
         - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
), runs AS (
  SELECT user_id, island, COUNT(*) AS len, MIN(d) AS start_d
  FROM isl GROUP BY 1, 2
), best AS (
  SELECT user_id, len, start_d,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_d) AS rn
  FROM runs
), top AS (
  SELECT user_id, len, start_d,
         ROW_NUMBER() OVER (ORDER BY len DESC, user_id) AS rk
  FROM best WHERE rn = 1
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(len AS BIGINT) AS streak_days,
       start_d AS streak_start
FROM top WHERE rk <= {_STREAK_TOPK}
ORDER BY streak_days DESC, user_id
"""


# ---------------------------------------------------------------------------
# single change-point detection over the hourly event series
# ---------------------------------------------------------------------------


def _q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares single change-point in the hourly event-count
    series: the split minimizing SSE_left + SSE_right (binary
    segmentation step 1 — the structural-shift complement to q_cusum's
    sequential detector).  Every candidate split's SSE comes from
    exact-integer prefix sums via ONE cumulative window, evaluated
    with one identically-parenthesized double formula, argmin
    tie-broken on the earlier hour.  IEEE +,-,*,/ are exactly rounded,
    so identical integer inputs give bit-identical doubles in both
    engines — no transcendentals anywhere.  Scale: O(|hours|) after
    the rollup, never a per-split rescan."""
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
    j = pre.crossJoin(F.broadcast(tot)).filter(F.col("k") < F.col("hh"))
    kd = F.col("k").cast(_D)
    rd = (F.col("hh") - F.col("k")).cast(_D)
    cyd = F.col("cy").cast(_D)
    ryd = (F.col("ty") - F.col("cy")).cast(_D)
    sse = (
        F.col("cyy").cast(_D) - cyd * cyd / kd
    ) + ((F.col("tyy") - F.col("cyy")).cast(_D) - ryd * ryd / rd)
    scored = j.select(
        "h", "k", "hh", "cy", "ty", sse.alias("sse")
    )
    best = scored.withColumn(
        "rn", F.row_number().over(Window.orderBy("sse", "h"))
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("h").cast("bigint").alias("split_after_hour"),
        F.col("k").cast("bigint").alias("n_left"),
        (F.col("hh") - F.col("k")).cast("bigint").alias("n_right"),
        F.round(F.col("sse"), 6).alias("sse_best"),
        F.round(F.col("cy").cast(_D) / F.col("k").cast(_D), 6).alias("mean_left"),
        F.round(
            (F.col("ty") - F.col("cy")).cast(_D)
            / (F.col("hh") - F.col("k")).cast(_D),
            6,
        ).alias("mean_right"),
    )


_SQL_CHANGEPOINT = """
WITH hourly AS (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h,
         COUNT(*) AS y
  FROM events GROUP BY 1
), pre AS (
  SELECT h,
         ROW_NUMBER() OVER (ORDER BY h) AS k,
         SUM(y) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cy,
         SUM(y * y) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cyy
  FROM hourly
), tot AS (
  SELECT COUNT(*) AS hh, SUM(y) AS ty, SUM(y * y) AS tyy FROM hourly
), scored AS (
  SELECT h, k, hh, cy, ty,
         (CAST(cyy AS DOUBLE)
          - CAST(cy AS DOUBLE) * CAST(cy AS DOUBLE) / CAST(k AS DOUBLE))
         + (CAST(tyy - cyy AS DOUBLE)
            - CAST(ty - cy AS DOUBLE) * CAST(ty - cy AS DOUBLE)
              / CAST(hh - k AS DOUBLE)) AS sse
  FROM pre CROSS JOIN tot
  WHERE k < hh
), best AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sse, h) AS rn FROM scored
)
SELECT CAST(h AS BIGINT) AS split_after_hour,
       CAST(k AS BIGINT) AS n_left,
       CAST(hh - k AS BIGINT) AS n_right,
       round(sse, 6) AS sse_best,
       round(CAST(cy AS DOUBLE) / CAST(k AS DOUBLE), 6) AS mean_left,
       round(CAST(ty - cy AS DOUBLE) / CAST(hh - k AS DOUBLE), 6) AS mean_right
FROM best WHERE rn = 1
"""


SESSION5_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_mann_whitney", _q_mann_whitney, _SQL_MANN_WHITNEY,
        "tie-corrected Mann-Whitney U (integer-rational)",
    ),
    QueryDef(
        "q_bh_fdr", _q_bh_fdr, _SQL_BH_FDR,
        "Benjamini-Hochberg step-up over Chebyshev p-values",
    ),
    QueryDef(
        "q_max_concurrent", _q_max_concurrent, _SQL_MAX_CONCURRENT,
        "sweep-line peak interval concurrency",
    ),
    QueryDef(
        "q_drawdown", _q_drawdown, _SQL_DRAWDOWN,
        "max drawdown of cumulative revenue (exact decimal)",
    ),
    QueryDef(
        "q_link_pred", _q_link_pred, _SQL_LINK_PRED,
        "resource-allocation link prediction (frozen 1/deg)",
    ),
    QueryDef(
        "q_mutual_info", _q_mutual_info, _SQL_MUTUAL_INFO,
        "nation x priority mutual information (frozen-ln)",
    ),
    QueryDef(
        "q_streaks", _q_streaks, _SQL_STREAKS,
        "gaps-and-islands longest activity streaks",
    ),
    QueryDef(
        "q_changepoint", _q_changepoint, _SQL_CHANGEPOINT,
        "least-squares single change-point (prefix-sum SSE)",
    ),
]
