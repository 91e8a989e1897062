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


# ---------------------------------------------------------------------------
# weighted isotonic regression via the minimax formula (no iteration)
# ---------------------------------------------------------------------------


def _q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic regression of mean purchase value on
    hour-of-day — the monotone-calibration fit (same statistic PAVA
    computes), expressed DECLARATIVELY via the minimax identity
    f(i) = max_{j<=i} min_{k>=i} wavg(y[j..k]): no iterative pooling,
    so Catalyst sees plain joins + aggregates and both engines agree
    bit-for-bit (prefix sums stay in exact DECIMAL/INTEGER; each
    interval average is ONE identically-parenthesized double
    division).  Scale: the triple join is over the compressed hour
    domain (24 rows -> <=24^3 tuples), never raw events; the events
    pass is one hash aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").filter(F.col("event_type") == "purchase")
    hourly = (
        ev.select(F.hour("ts").alias("h"), money("value").alias("y"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("w"), F.sum("y").alias("s"))
    )
    wc = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = hourly.select(
        "h",
        "w",
        "s",
        F.row_number().over(Window.orderBy("h")).alias("i"),
        F.sum("w").over(wc).alias("cw"),
        F.sum("s").over(wc).alias("cs"),
    )
    pj = pre.select(
        F.col("i").alias("ji"),
        (F.col("cw") - F.col("w")).alias("cwj"),
        (F.col("cs") - F.col("s")).alias("csj"),
    )
    pk = pre.select(
        F.col("i").alias("ki"), F.col("cw").alias("cwk"), F.col("cs").alias("csk")
    )
    avgs = (
        pj.join(pk, pj.ji <= pk.ki)
        .select(
            "ji",
            "ki",
            (
                (F.col("csk") - F.col("csj")).cast(_D)
                / (F.col("cwk") - F.col("cwj")).cast(_D)
            ).alias("av"),
        )
    )
    pi = pre.select("i", "h", "w", "s")
    tri = avgs.join(
        pi, (F.col("ji") <= F.col("i")) & (F.col("i") <= F.col("ki"))
    )
    inner = tri.groupBy("i", "ji").agg(F.min("av").alias("mn"))
    fit = inner.groupBy("i").agg(F.max("mn").alias("fitted"))
    return (
        fit.join(pi, "i")
        .select(
            F.col("h").cast("int").alias("hour"),
            F.col("w").cast("bigint").alias("n_events"),
            F.round(F.col("s").cast(_D) / F.col("w").cast(_D), 6).alias("raw_avg"),
            F.round("fitted", 6).alias("fitted"),
        )
        .orderBy("hour")
    )


_SQL_ISOTONIC = """
WITH hourly AS (
  SELECT hour(ts) AS h, COUNT(*) AS w,
         SUM(CAST(value AS DECIMAL(18,2))) AS s
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), pre AS MATERIALIZED (
  SELECT h, w, s,
         ROW_NUMBER() OVER (ORDER BY h) AS i,
         SUM(w) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(s) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cs
  FROM hourly
), avgs AS MATERIALIZED (
  SELECT j.i AS ji, k.i AS ki,
         CAST(k.cs - (j.cs - j.s) AS DOUBLE)
         / CAST(k.cw - (j.cw - j.w) AS DOUBLE) AS av
  FROM pre j JOIN pre k ON j.i <= k.i
), inner_min AS (
  SELECT p.i, a.ji, MIN(a.av) AS mn
  FROM avgs a JOIN pre p ON a.ji <= p.i AND p.i <= a.ki
  GROUP BY 1, 2
), fit AS (
  SELECT i, MAX(mn) AS fitted FROM inner_min GROUP BY 1
)
SELECT CAST(p.h AS INT) AS hour, CAST(p.w AS BIGINT) AS n_events,
       round(CAST(p.s AS DOUBLE) / CAST(p.w AS DOUBLE), 6) AS raw_avg,
       round(f.fitted, 6) AS fitted
FROM fit f JOIN pre p USING (i)
ORDER BY hour
"""


# ---------------------------------------------------------------------------
# dynamic time warping between hour-of-day profiles (applyInPandas DP)
# ---------------------------------------------------------------------------

_DTW_N = 24


def _q_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance between each event type's 24-point hour-of-day
    value profile and the 'view' profile — elastic series matching
    where Euclidean comparison fails on phase shifts.  The genuinely
    ITERATIVE recurrence dp[i][j] = c + min(left, up, diag) runs as an
    Arrow-batched applyInPandas NumPy DP per event type (the
    custom-operator escape hatch: one group per series pair, series
    pre-aggregated to 24 points, so state is O(N^2) tiny while the
    events pass stays one hash aggregate).  Profiles are frozen to
    round-6 doubles before the DP; every DP cell is then a uniquely
    determined IEEE double (min/add only, no reassociation), so the
    oracle — the SAME recurrence unrolled over the 47 anti-diagonals
    as chained SQL CTEs — matches bit-for-bit.  The self-pair
    (view vs view) rides along as a built-in zero check."""
    import numpy as np
    import pandas as pd

    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "event_type", F.hour("ts").alias("h"), money("value").alias("y")
    )
    prof = (
        ev.groupBy("event_type", "h")
        .agg(
            F.round(
                F.sum("y").cast(_D) / F.count(F.lit(1)).cast(_D), 6
            ).alias("p")
        )
    )
    types = ev.select("event_type").distinct()
    hours = spark.range(_DTW_N).select(F.col("id").cast("int").alias("h"))
    dense = (
        types.crossJoin(hours)
        .join(prof, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("p", F.lit(0.0)).alias("p"))
    )
    bprof = dense.filter(F.col("event_type") == "view").select(
        "h", F.col("p").alias("pb")
    )
    paired = dense.join(F.broadcast(bprof), "h")

    def dtw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        a = pdf["p"].to_numpy(dtype=np.float64)
        b = pdf["pb"].to_numpy(dtype=np.float64)
        n = len(a)
        dp = np.full((n + 1, n + 1), np.inf)
        dp[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                c = abs(a[i - 1] - b[j - 1])
                dp[i, j] = c + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
        d = float(dp[n, n])
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "dtw_dist": [round(d, 6)],
                "dtw_per_step": [round(d / (2 * n), 6)],
            }
        )

    return (
        paired.groupBy("event_type")
        .applyInPandas(dtw, "event_type string, dtw_dist double, dtw_per_step double")
        .orderBy("event_type")
    )


def _sql_dtw() -> str:
    """Oracle for _q_dtw: the identical DP unrolled over anti-diagonals
    i+j = k as a chain of 47 CTEs (cells of diagonal k depend only on
    diagonals k-1 and k-2, so each stage is one 3-way left join of
    tiny cell sets — no recursion needed and no ordering ambiguity)."""
    n = _DTW_N
    parts = [
        f"""WITH prof AS MATERIALIZED (
  SELECT event_type AS t, hour(ts) AS h,
         round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS p
  FROM events GROUP BY 1, 2
), types AS (SELECT DISTINCT event_type AS t FROM events),
hours AS (SELECT CAST(range AS INT) AS h FROM range({n})),
dense AS MATERIALIZED (
  SELECT ty.t, hh.h, COALESCE(p.p, 0.0) AS p
  FROM types ty CROSS JOIN hours hh
  LEFT JOIN prof p ON p.t = ty.t AND p.h = hh.h
), bprof AS (SELECT h, p AS pb FROM dense WHERE t = 'view'),
cost AS MATERIALIZED (
  SELECT d.t, d.h + 1 AS i, b.h + 1 AS j, abs(d.p - b.pb) AS c
  FROM dense d CROSS JOIN bprof b
),
dp2 AS MATERIALIZED (SELECT t, i, j, c AS v FROM cost WHERE i = 1 AND j = 1)"""
    ]
    for k in range(3, 2 * n + 1):
        diag = (
            f"LEFT JOIN dp{k - 2} d ON d.t = c.t AND d.i = c.i - 1 AND d.j = c.j - 1"
            if k > 3
            else ""
        )
        dterm = "COALESCE(d.v, 1e300)" if k > 3 else "1e300"
        parts.append(
            f""",
dp{k} AS MATERIALIZED (
  SELECT c.t, c.i, c.j,
         c.c + least(COALESCE(a.v, 1e300), COALESCE(b.v, 1e300), {dterm}) AS v
  FROM cost c
  LEFT JOIN dp{k - 1} a ON a.t = c.t AND a.i = c.i - 1 AND a.j = c.j
  LEFT JOIN dp{k - 1} b ON b.t = c.t AND b.i = c.i AND b.j = c.j - 1
  {diag}
  WHERE c.i + c.j = {k}
)"""
        )
    parts.append(
        f"""
SELECT t AS event_type, round(v, 6) AS dtw_dist,
       round(v / {2 * n}.0, 6) AS dtw_per_step
FROM dp{2 * n} ORDER BY 1"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# WOE / information value over totalprice deciles
# ---------------------------------------------------------------------------

_WOE_BINS = 10


def _q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning + information value of order total
    price against the URGENT-priority target — the credit-scoring
    feature-screening classic.  Deciles come from ntile over the TOTAL
    order (money(o_totalprice), o_orderkey) so bin membership is
    deterministic; each WOE is a frozen-ln DECIMAL(18,6); the IV sum
    multiplies INTEGER (g_b*B - b_b*G) weights by the frozen WOEs
    (exact), dividing by G*B once at the end.  Scale: one window rank
    over orders + a 10-row reduce."""
    cat = Catalog(sf_dir)
    orders = scan(
        spark, cat, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    binned = orders.select(
        F.ntile(_WOE_BINS)
        .over(Window.orderBy(money("o_totalprice"), "o_orderkey"))
        .alias("bin"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("bad"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("bad").alias("nb")
    ).withColumn("ng", F.col("n") - F.col("nb"))
    wall = Window.partitionBy()
    tot = per_bin.select(
        "*",
        F.sum("ng").over(wall).alias("gt"),
        F.sum("nb").over(wall).alias("bt"),
    )
    woe_dec = F.round(
        F.log(
            (F.col("ng").cast(_D) * F.col("bt").cast(_D))
            / (F.col("nb").cast(_D) * F.col("gt").cast(_D))
        ),
        6,
    ).cast("decimal(18,6)")
    scored = tot.withColumn("woe_dec", woe_dec)
    iv = F.round(
        F.sum(
            (F.col("ng") * F.col("bt") - F.col("nb") * F.col("gt")) * F.col("woe_dec")
        )
        .over(wall)
        .cast(_D)
        / (F.col("gt").cast(_D) * F.col("bt").cast(_D)),
        6,
    )
    return scored.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("nb").cast("bigint").alias("n_bad"),
        F.col("woe_dec").cast(_D).alias("woe"),
        iv.alias("iv_total"),
    ).orderBy("bin")


_SQL_WOE_IV = f"""
WITH binned AS (
  SELECT NTILE({_WOE_BINS}) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)),
                                  o_orderkey) AS bin,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS bad
  FROM orders
), per_bin AS (
  SELECT bin, COUNT(*) AS n, SUM(bad) AS nb, COUNT(*) - SUM(bad) AS ng
  FROM binned GROUP BY 1
), tot AS (
  SELECT *, SUM(ng) OVER () AS gt, SUM(nb) OVER () AS bt FROM per_bin
), scored AS (
  SELECT *, CAST(round(ln((CAST(ng AS DOUBLE) * CAST(bt AS DOUBLE))
                          / (CAST(nb AS DOUBLE) * CAST(gt AS DOUBLE))), 6)
            AS DECIMAL(18,6)) AS woe_dec
  FROM tot
)
SELECT CAST(bin AS INT) AS bin, CAST(n AS BIGINT) AS n_orders,
       CAST(nb AS BIGINT) AS n_bad,
       CAST(woe_dec AS DOUBLE) AS woe,
       round(CAST(SUM((ng * bt - nb * gt) * woe_dec) OVER () AS DOUBLE)
             / (CAST(gt AS DOUBLE) * CAST(bt AS DOUBLE)), 6) AS iv_total
FROM scored
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# HITS hubs & authorities, 2 exact-integer unrolled iterations
# ---------------------------------------------------------------------------


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled HITS iterations on the directed top-3 trade graph:
    a1 = indegree, h1 = E a1, a2 = E^T h1, h2 = E a2 — hubs-and-
    authorities as EXACT INTEGERS (normalization is scale-invariant,
    so it is deferred entirely to the output, one double division by
    the max).  Distinct from q_pagerank's damped walk: HITS separates
    'points at good pages' from 'is pointed at by good hubs'.  Scale:
    each iteration is one edges-groupBy, the same shape as the
    unrolled q_label_prop oracle."""
    edges = _trade_edges_topk(spark, sf_dir)
    nation = scan(spark, Catalog(sf_dir), "nation", ["n_nationkey", "n_name"])
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    a1 = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("a1"))
    h1 = (
        edges.join(a1, "dst")
        .groupBy("src")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "src")
        .groupBy("dst")
        .agg(F.sum("h1").alias("a2"))
    )
    h2 = (
        edges.join(a2, "dst")
        .groupBy("src")
        .agg(F.sum("a2").alias("h2"))
    )
    scored = (
        nodes.join(a2, nodes.node == a2.dst, "left")
        .join(h2, nodes.node == h2.src, "left")
        .select(
            "node",
            F.coalesce("a2", F.lit(0)).alias("auth"),
            F.coalesce("h2", F.lit(0)).alias("hub"),
        )
    )
    wall = Window.partitionBy()
    normed = scored.select(
        "node",
        "auth",
        "hub",
        F.max("auth").over(wall).alias("ma"),
        F.max("hub").over(wall).alias("mh"),
    )
    return (
        normed.join(F.broadcast(nation), normed.node == nation.n_nationkey)
        .select(
            "n_name",
            F.col("auth").cast("bigint").alias("auth_score"),
            F.col("hub").cast("bigint").alias("hub_score"),
            F.round(F.col("auth").cast(_D) / F.col("ma").cast(_D), 6).alias(
                "auth_norm"
            ),
            F.round(F.col("hub").cast(_D) / F.col("mh").cast(_D), 6).alias("hub_norm"),
        )
        .orderBy(F.desc("auth_score"), "n_name")
    )


_SQL_HITS = rf"""
WITH {_SQL_TRADE_EDGES},
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
), a1 AS (
  SELECT dst, COUNT(*) AS a1 FROM edges GROUP BY 1
), h1 AS (
  SELECT e.src, SUM(a1.a1) AS h1 FROM edges e JOIN a1 ON a1.dst = e.dst GROUP BY 1
), a2 AS (
  SELECT e.dst, SUM(h1.h1) AS a2 FROM edges e JOIN h1 ON h1.src = e.src GROUP BY 1
), h2 AS (
  SELECT e.src, SUM(a2.a2) AS h2 FROM edges e JOIN a2 ON a2.dst = e.dst GROUP BY 1
), scored AS (
  SELECT n.node, COALESCE(a2.a2, 0) AS auth, COALESCE(h2.h2, 0) AS hub
  FROM nodes n
  LEFT JOIN a2 ON a2.dst = n.node
  LEFT JOIN h2 ON h2.src = n.node
), normed AS (
  SELECT node, auth, hub, MAX(auth) OVER () AS ma, MAX(hub) OVER () AS mh
  FROM scored
)
SELECT n_name, CAST(auth AS BIGINT) AS auth_score, CAST(hub AS BIGINT) AS hub_score,
       round(CAST(auth AS DOUBLE) / CAST(ma AS DOUBLE), 6) AS auth_norm,
       round(CAST(hub AS DOUBLE) / CAST(mh AS DOUBLE), 6) AS hub_norm
FROM normed JOIN nation ON n_nationkey = node
ORDER BY auth_score DESC, n_name
"""


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B estimate (no-RNG arms, exact moments)
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "2024-01-16"


def _q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B means: per-user pre-period value (x, before
    2024-01-16) as the covariate for the post-period metric (y),
    theta = cov(x,y)/var(x) pooled, adj_mean = raw - theta*(x_arm -
    x_all) — the variance-reduction estimator every experimentation
    platform runs.  Arms are the no-RNG md5 split (first hex digit
    0-7 -> A); x, y are exact integer CENTS; all five moments are
    exact integer sums cast to double ONCE for identically-
    parenthesized formulas.  Scale: one events aggregate per user,
    one 2-row arm reduce."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "ts", money("value").alias("v"))
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        (
            F.coalesce(F.sum(F.when(F.col("ts") < split, F.col("v"))), F.lit(0))
            * 100
        )
        .cast("long")
        .alias("x"),
        (
            F.coalesce(F.sum(F.when(F.col("ts") >= split, F.col("v"))), F.lit(0))
            * 100
        )
        .cast("long")
        .alias("y"),
    )
    armed = per_user.withColumn(
        "arm",
        F.when(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("cuped"))), 1, 1
            ).isin(*list("01234567")),
            "A",
        ).otherwise("B"),
    )
    tot = armed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    per_arm = armed.groupBy("arm").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("x").alias("sxa"),
        F.sum("y").alias("sya"),
    )
    j = per_arm.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast(_D)
    cov = nd * F.col("sxy").cast(_D) - F.col("sx").cast(_D) * F.col("sy").cast(_D)
    varx = nd * F.col("sxx").cast(_D) - F.col("sx").cast(_D) * F.col("sx").cast(_D)
    vary = nd * F.col("syy").cast(_D) - F.col("sy").cast(_D) * F.col("sy").cast(_D)
    theta = cov / varx
    raw_mean = F.col("sya").cast(_D) / F.col("na").cast(_D) / F.lit(100.0)
    adj = raw_mean - theta * (
        F.col("sxa").cast(_D) / F.col("na").cast(_D) / F.lit(100.0)
        - F.col("sx").cast(_D) / nd / F.lit(100.0)
    )
    return j.select(
        "arm",
        F.col("na").cast("bigint").alias("n_users"),
        F.round(raw_mean, 6).alias("raw_mean"),
        F.round(adj, 6).alias("adj_mean"),
        F.round(theta, 6).alias("theta"),
        F.round(cov * cov / (varx * vary), 6).alias("rho2"),
    ).orderBy("arm")


_SQL_CUPED = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                        THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                        THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS y
  FROM events GROUP BY 1
), armed AS (
  SELECT *, CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || 'cuped'), 1, 1)
                 BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm
  FROM per_user
), tot AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM armed
), per_arm AS (
  SELECT arm, COUNT(*) AS na, SUM(x) AS sxa, SUM(y) AS sya
  FROM armed GROUP BY 1
)
SELECT arm, CAST(na AS BIGINT) AS n_users,
       round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6) AS raw_mean,
       round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
             - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
               * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
                  - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0), 6) AS adj_mean,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho2
FROM per_arm CROSS JOIN tot
ORDER BY arm
"""


SESSION5_QUERIES.extend(
    [
        QueryDef(
            "q_isotonic", _q_isotonic, _SQL_ISOTONIC,
            "weighted isotonic fit via the minimax identity",
        ),
        QueryDef(
            "q_dtw", _q_dtw, _sql_dtw(),
            "DTW profile distance (pandas DP vs unrolled-diagonal SQL)",
        ),
        QueryDef(
            "q_woe_iv", _q_woe_iv, _SQL_WOE_IV,
            "WOE bins + information value (frozen-ln, exact IV sum)",
        ),
        QueryDef(
            "q_hits", _q_hits, _SQL_HITS,
            "HITS hubs/authorities, 2 exact-integer iterations",
        ),
        QueryDef(
            "q_cuped", _q_cuped, _SQL_CUPED,
            "CUPED variance-reduced A/B means (no-RNG arms)",
        ),
    ]
)
