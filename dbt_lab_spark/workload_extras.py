"""r3-session additions: graph traversal (BFS, triangles), MERGE
upsert, token co-occurrence PMI, and robust (MAD) outlier detection.
Same (builder, oracle) contract as dbt_lab_spark.workload.

Reference capability evidence, cited per query: the reference's
iterative/bulk surface is the Hadoop bulk-operator extension point
(mapred/qexec/examples/CountTuplesOperator.java:36-67) and its join +
aggregate physical operators (qexec/PhysicalOperators*.java); each
query here re-expresses one distributed shape a user of that surface
would build, Spark-first.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.operators.scan import fan_out_if_small, scan
from dbt_lab_spark.workload import QueryDef

# ---------------------------------------------------------------------------
# trade graph: top-3 out-edges per nation (scale-invariant density)
# ---------------------------------------------------------------------------

_TOP_OUT_EDGES = 3


def _trade_edges_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation graph: customer nation -> supplier nation, kept
    to each source's top-3 edges by lineitem count (rank ties broken by
    dst).  Top-k-per-src keeps the graph's density scale-invariant —
    the same extraction at 100 TB yields the same 25-node topology
    class, unlike an absolute count threshold.

    The result is localCheckpoint-ed (r10 opt): every consumer is an
    iterative/unrolled graph query that references this relation many
    times (kcore peels, LPA rounds, triangle wedge self-joins), and
    without truncation each reference re-plans — and partially
    re-executes — the fact-fact join underneath (measured: q_kcore's
    physical plan reached 2,164 operators / 1,356 Exchange+Scan nodes,
    15.6 s build+explain).  The checkpointed relation is bounded at
    |nations| x top-k rows at ANY scale factor, so materializing it is
    O(1) — the guide §3.3 "materialise an intermediate to truncate the
    plan" case with a provably tiny intermediate."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", ["l_orderkey", "l_suppkey"])
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_custkey"])
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey"])
    supp = scan(spark, cat, "supplier", ["s_suppkey", "s_nationkey"])
    weighted = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_OUT_EDGES)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )


# The src<>dst predicate depends only on the group keys, so it runs
# AFTER the aggregate (HAVING): putting it in the join condition makes
# DuckDB pick a customer x supplier inequality nested-loop join (21s at
# sf0.1 vs 0.3s); MATERIALIZED stops re-evaluation when downstream CTEs
# reference edges more than once.  Results are identical either way.
_SQL_TRADE_EDGES = rf"""
edges_all AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
  HAVING src <> dst
), edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM edges_all)
  WHERE rn <= {_TOP_OUT_EDGES}
)"""


_BFS_SOURCE = 0
_BFS_MAX_HOPS = 8


def _q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the top-3 trade graph: minimum hops from
    nation 0 to every reachable nation — the reachability primitive of
    link-graph curation (crawl-frontier distance, seed-set expansion).

    Spark shape: Pregel-style frontier iteration (frontier JOIN edges,
    anti-join visited, per-round lineage truncation) from
    functions/graph.py:bfs_hops.  Full oracle: DuckDB runs the same
    search as a recursive CTE with a hop cap; MIN(hops) per node is
    visit-order-independent, so both sides agree exactly."""
    from dbt_lab_spark.functions.graph import bfs_hops

    edges = _trade_edges_topk(spark, sf_dir)
    nation = scan(spark, Catalog(sf_dir), "nation", ["n_nationkey", "n_name"])
    hops = bfs_hops(edges, _BFS_SOURCE, max_hops=_BFS_MAX_HOPS)
    return (
        hops.join(F.broadcast(nation), hops.node == nation.n_nationkey)
        .select("n_name", F.col("hops").cast("int").alias("hops"))
        .orderBy("hops", "n_name")
    )


_SQL_BFS_HOPS = rf"""
WITH RECURSIVE {_SQL_TRADE_EDGES},
bfs(node, hops) AS (
  SELECT CAST({_BFS_SOURCE} AS BIGINT), 0
  UNION ALL
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.hops < {_BFS_MAX_HOPS}
)
SELECT n_name, CAST(hops AS INT) AS hops
FROM (SELECT node, MIN(hops) AS hops FROM bfs GROUP BY node)
JOIN nation ON n_nationkey = node
ORDER BY hops, n_name
"""


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle counts over the undirected top-3 trade
    graph — the local-clustering signal web-curation pipelines use for
    spam/link-farm detection.

    Spark shape: degree-oriented wedge join (functions/graph.py:
    triangle_count), the O(m^1.5) plan that survives power-law skew.
    Full oracle: DuckDB counts the identical triangle set with the
    plain a<b three-way self-join; per-corner counts match because the
    orientation changes only which join produces a triangle, never the
    set."""
    from dbt_lab_spark.functions.graph import triangle_count

    edges = _trade_edges_topk(spark, sf_dir)
    nation = scan(spark, Catalog(sf_dir), "nation", ["n_nationkey", "n_name"])
    tri = triangle_count(edges)
    return (
        tri.join(F.broadcast(nation), tri.node == nation.n_nationkey)
        .select("n_name", F.col("n_tri").cast("long").alias("n_tri"))
        .orderBy(F.desc("n_tri"), "n_name")
    )


_SQL_TRIANGLES = rf"""
WITH {_SQL_TRADE_EDGES},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
  WHERE src <> dst
), tris AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), corners AS (
  SELECT u AS node FROM tris
  UNION ALL SELECT v FROM tris
  UNION ALL SELECT w FROM tris
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_tri
FROM corners JOIN nation ON n_nationkey = node
GROUP BY n_name
ORDER BY n_tri DESC, n_name
"""


# ---------------------------------------------------------------------------
# MERGE upsert over documents
# ---------------------------------------------------------------------------


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on the documents table: an update batch
    (every 7th doc re-curated: text uppercased, source recoded) plus
    an insert batch (synthetic docs keyed past the existing range),
    merged with updates-win-on-collision via operators/dml.py:
    upsert_by_keys — one union + one row_number shuffle, the
    distributed MERGE plan.

    Full oracle: DuckDB expresses the same merge as updates UNION ALL
    (base ANTI JOIN updates); the per-source audit (doc counts, char
    mass, uppercased-doc count) pins that update rows really replaced
    their base rows."""
    from dbt_lab_spark.operators.dml import upsert_by_keys

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    updates = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.upper(F.col("text")).alias("text"),
            "lang",
            F.lit("curated").alias("source"),
            "n_chars",
        )
    )
    inserts = (
        docs.filter(F.col("doc_id") % 13 == 0)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit("synthetic doc "), F.col("doc_id").cast("string")).alias("text"),
            F.lit("xx").alias("lang"),
            F.lit("synthetic").alias("source"),
            F.length(F.concat(F.lit("synthetic doc "), F.col("doc_id").cast("string"))).alias(
                "n_chars"
            ),
        )
    )
    merged = upsert_by_keys(docs, updates.unionByName(inserts), keys=["doc_id"])
    return (
        merged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.sum((F.col("text") == F.upper(F.col("text"))).cast("long")).alias("n_upper"),
        )
        .orderBy("source")
    )


_SQL_MERGE_UPSERT = r"""
WITH updates AS (
  SELECT doc_id, upper(text) AS text, lang, 'curated' AS source, n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 10000000, 'synthetic doc ' || CAST(doc_id AS VARCHAR), 'xx',
         'synthetic', length('synthetic doc ' || CAST(doc_id AS VARCHAR))
  FROM documents WHERE doc_id % 13 = 0
), merged AS (
  SELECT * FROM updates
  UNION ALL
  SELECT d.* FROM documents d ANTI JOIN updates u ON u.doc_id = d.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       SUM(length(text)) AS sum_chars,
       SUM(CASE WHEN text = upper(text) THEN 1 ELSE 0 END) AS n_upper
FROM merged
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# token co-occurrence PMI (embedding-training prep)
# ---------------------------------------------------------------------------

_PMI_WINDOW = 2
_PMI_MIN_COUNT = 20
_PMI_TOP = 20


def _q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring within
    a ±2 window — the co-occurrence statistic word-embedding training
    (GloVe/word2vec count prep) extracts from a corpus.

    Spark shape: pairs are generated JVM-side with array higher-order
    functions (sequence/transform/filter/flatten) — NO self-join on
    position; one explode to token-pair granularity then hash
    aggregates, with the two marginal totals broadcast back as 1-row
    cross joins.  Full oracle: DuckDB builds the same pairs with a
    zipped-unnest position table and a banded self-join; identical
    integer counts feed an identical ln() expression, rounded to 6."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text"])
    toks = docs.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    pair_expr = f"""
    flatten(transform(sequence(0, size(t) - 2), i ->
      filter(transform(sequence(1, {_PMI_WINDOW}), d ->
        IF(i + d <= size(t) - 1,
           struct(least(t[i], t[i + d]) AS w1, greatest(t[i], t[i + d]) AS w2),
           CAST(NULL AS STRUCT<w1: STRING, w2: STRING>))),
        x -> x IS NOT NULL)))
    """
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
    )
    tok_counts = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    t_pairs = pairs.agg(F.sum("c_xy").alias("t_pairs"))
    t_toks = tok_counts.agg(F.sum("c").alias("t_toks"))
    c1 = tok_counts.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))
    c2 = tok_counts.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))
    return (
        pairs.filter(F.col("c_xy") >= _PMI_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(t_pairs))
        .crossJoin(F.broadcast(t_toks))
        .select(
            "w1",
            "w2",
            F.col("c_xy").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") / F.col("t_pairs"))
                    / (
                        (F.col("c_x").cast("double") / F.col("t_toks"))
                        * (F.col("c_y").cast("double") / F.col("t_toks"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP)
    )


_SQL_COOCCUR_PMI = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
), pos AS (
  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos FROM toks
), pairs AS (
  SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2,
         COUNT(*) AS c_xy
  FROM pos a
  JOIN pos b ON b.doc_id = a.doc_id
            AND b.pos > a.pos AND b.pos <= a.pos + {_PMI_WINDOW}
  GROUP BY 1, 2
), tc AS (
  SELECT tok, COUNT(*) AS c FROM pos GROUP BY tok
), tp AS (SELECT SUM(c_xy) AS t_pairs FROM pairs),
tt AS (SELECT SUM(c) AS t_toks FROM tc)
SELECT w1, w2, c_xy AS n_pair,
       ROUND(ln((CAST(c_xy AS DOUBLE) / t_pairs)
             / ((CAST(cx.c AS DOUBLE) / t_toks) * (CAST(cy.c AS DOUBLE) / t_toks))), 6) AS pmi
FROM pairs
JOIN tc cx ON cx.tok = pairs.w1
JOIN tc cy ON cy.tok = pairs.w2, tp, tt
WHERE c_xy >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOP}
"""


# ---------------------------------------------------------------------------
# robust (median/MAD) outlier detection
# ---------------------------------------------------------------------------

_MAD_K = 3.0 * 1.4826  # 3-sigma-equivalent under normality


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier counts per event type — the
    heavy-tail-safe variant of q_zscore_outliers (a single corrupt
    batch can't drag the threshold the way it drags a mean/stddev).

    Spark shape: two grouped exact-median aggregates over the same
    key with the tiny per-group medians broadcast back between them —
    no window over the full table, no driver collect.  Medians are
    order statistics (exact, interpolated the same way by Spark's
    median and DuckDB's), so the derived doubles agree bit-for-bit and
    the oracle is a full hash match."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["event_type", "value"])
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > _MAD_K * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
        )
        .orderBy("event_type")
    )


_SQL_MAD_OUTLIERS = rf"""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m ON m.event_type = e.event_type
  GROUP BY e.event_type
)
SELECT e.event_type,
       COUNT(*) AS n,
       SUM(CASE WHEN abs(e.value - m.med) > {_MAD_K!r} * d.mad THEN 1 ELSE 0 END) AS n_outliers,
       ROUND(ANY_VALUE(m.med), 4) AS med,
       ROUND(ANY_VALUE(d.mad), 4) AS mad
FROM events e
JOIN med m ON m.event_type = e.event_type
JOIN mad d ON d.event_type = e.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


def _q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_decontaminate's semantics through the Bloom pre-pass
    (llm/curation.py:bloom_decontamination_pairs): eval 8-gram keys
    folded into a broadcast bitset, train grams probed map-only, and
    only probable hits reach the exact verify join.  No false
    negatives ⇒ bit-identical results to the exact path, so this
    carries the SAME full oracle — what the driver checks is that the
    approximate pre-filter provably didn't change the answer."""
    from dbt_lab_spark.llm.curation import bloom_decontamination_pairs

    cat = Catalog(sf_dir)
    # Fan out the single-row-group scan across cores before the
    # compute-dense n-gram/vector pipelines (size-gated, guide 2.4).
    docs = fan_out_if_small(scan(spark, cat, "documents", ["doc_id", "text"]))
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    pairs = bloom_decontamination_pairs(tr, ev, k=8, min_shared=1, fpp=0.01)
    return pairs.groupBy("eval_id").agg(
        F.count("*").alias("n_train_docs"),
        F.sum("n_shared").cast("long").alias("n_shared_ngrams"),
        F.max("n_shared").alias("max_shared"),
    )


def _sql_bloom_decontaminate() -> str:
    from dbt_lab_spark.workload_beyond import _SQL_DECONTAMINATE

    return _SQL_DECONTAMINATE


# ---------------------------------------------------------------------------
# dataset snapshot diff
# ---------------------------------------------------------------------------


def _q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between documents-v1 and a derived v2 (every 7th
    doc re-curated, every 13th spawning a synthetic insert, every 11th
    deleted) — the audit a pipeline runs between corpus versions.

    Spark shape: operators/dml.py:dataset_diff — ONE full-outer key
    shuffle with null-safe per-column change flags; the audit
    aggregate is a 4-row rollup.  Full oracle: DuckDB builds the same
    v2 and classifies with IS DISTINCT FROM."""
    from dbt_lab_spark.operators.dml import dataset_diff

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    updates = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.upper(F.col("text")).alias("text"),
        "lang",
        F.lit("curated").alias("source"),
        "n_chars",
    )
    inserts = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("synthetic doc "), F.col("doc_id").cast("string")).alias("text"),
        F.lit("xx").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length(F.concat(F.lit("synthetic doc "), F.col("doc_id").cast("string"))).alias(
            "n_chars"
        ),
    )
    from dbt_lab_spark.operators.dml import upsert_by_keys

    v2 = upsert_by_keys(docs, updates.unionByName(inserts), keys=["doc_id"]).filter(
        F.col("doc_id") % 11 != 0
    )
    diff = dataset_diff(docs, v2, keys=["doc_id"])
    return (
        diff.groupBy("change")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("text_changed").cast("long")).alias("n_text_changed"),
            F.sum(F.col("source_changed").cast("long")).alias("n_source_changed"),
            F.sum(F.col("lang_changed").cast("long")).alias("n_lang_changed"),
        )
        .orderBy("change")
    )


_SQL_DATASET_DIFF = r"""
WITH updates AS (
  SELECT doc_id, upper(text) AS text, lang, 'curated' AS source, n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 10000000, 'synthetic doc ' || CAST(doc_id AS VARCHAR), 'xx',
         'synthetic', length('synthetic doc ' || CAST(doc_id AS VARCHAR))
  FROM documents WHERE doc_id % 13 = 0
), v2 AS (
  SELECT * FROM (
    SELECT * FROM updates
    UNION ALL
    SELECT d.* FROM documents d ANTI JOIN updates u ON u.doc_id = d.doc_id
  ) WHERE doc_id % 11 <> 0
), diff AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN (o.text IS DISTINCT FROM n.text)
                OR (o.lang IS DISTINCT FROM n.lang)
                OR (o.source IS DISTINCT FROM n.source)
                OR (o.n_chars IS DISTINCT FROM n.n_chars) THEN 'changed'
              ELSE 'unchanged' END AS change,
         (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
          AND (o.text IS DISTINCT FROM n.text)) AS text_changed,
         (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
          AND (o.source IS DISTINCT FROM n.source)) AS source_changed,
         (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
          AND (o.lang IS DISTINCT FROM n.lang)) AS lang_changed
  FROM documents o FULL OUTER JOIN v2 n ON n.doc_id = o.doc_id
)
SELECT change,
       COUNT(*) AS n_rows,
       SUM(CASE WHEN text_changed THEN 1 ELSE 0 END) AS n_text_changed,
       SUM(CASE WHEN source_changed THEN 1 ELSE 0 END) AS n_source_changed,
       SUM(CASE WHEN lang_changed THEN 1 ELSE 0 END) AS n_lang_changed
FROM diff
GROUP BY change
ORDER BY change
"""


# ---------------------------------------------------------------------------
# entity resolution: fuzzy pairs -> connected components
# ---------------------------------------------------------------------------


def _q_entity_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: q_fuzzy_pairs' blocked
    levenshtein matches (distinct part names, noun-token blocking,
    edit distance ≤3) resolved into entity clusters by
    llm/dedup.py:connected_components, singletons kept as their own
    entity.

    This puts the iterative CC operator itself under a FULL oracle for
    the first time: DuckDB computes the same components as a recursive
    transitive closure over the identical pair set (min-reachable-name
    per node == min-label propagation fixpoint).  Output: entity
    (min name), n_names, n_rows."""
    from dbt_lab_spark.llm.dedup import connected_components

    cat = Catalog(sf_dir)
    part = scan(spark, cat, "part", ["p_partkey", "p_name"])
    names = part.groupBy("p_name").agg(F.count("*").alias("n_rows"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.split(F.col("p_name"), " ").getItem(1).alias("__block"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.split(F.col("p_name"), " ").getItem(1).alias("__block"),
    )
    pairs = (
        a.join(b, "__block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select("name_a", "name_b")
    )
    comp = connected_components(pairs, id_a="name_a", id_b="name_b")
    return (
        names.join(comp, names.p_name == comp.id, "left")
        .select(
            "p_name",
            F.coalesce(F.col("component"), F.col("p_name")).alias("entity"),
            "n_rows",
        )
        .groupBy("entity")
        .agg(F.count("*").alias("n_names"), F.sum("n_rows").alias("n_rows"))
        .orderBy("entity")
    )


_SQL_ENTITY_CC = r"""
WITH RECURSIVE names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM part GROUP BY p_name
), pairs AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b
    ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
   AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 3
), und AS (
  SELECT name_a AS a, name_b AS b FROM pairs
  UNION
  SELECT name_b, name_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b
), comp AS (
  SELECT n.p_name,
         LEAST(n.p_name, COALESCE(MIN(r.b), n.p_name)) AS entity,
         ANY_VALUE(n.n_rows) AS n_rows
  FROM names n LEFT JOIN reach r ON r.a = n.p_name
  GROUP BY n.p_name
)
SELECT entity, COUNT(*) AS n_names, SUM(n_rows) AS n_rows
FROM comp
GROUP BY entity
ORDER BY entity
"""


# ---------------------------------------------------------------------------
# Avro object-container round-trip
# ---------------------------------------------------------------------------


def _q_avro_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro object-container round-trip: pack documents into deflate
    Avro shards (sources.py:build_avro_shards — spec-implemented OCF
    writer, one applyInPandas group per shard), then read them back
    distributed (read_avro_docs: map-only Arrow stage decoding against
    each file's embedded writer schema) and audit per source.

    Full oracle: DuckDB computes the same audit from the documents
    table directly — equality proves the round-trip lost nothing (text
    byte length AND stored metadata survive).  Same contract as
    q_warc_ingest / q_webdataset."""
    from dbt_lab_spark.sources import build_avro_shards, read_avro_docs

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    shards = build_avro_shards(docs, n_shards=8, codec="deflate")
    decoded = read_avro_docs(shards)
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_records"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("sum_text_chars"),
            F.sum("n_chars").alias("sum_n_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


_SQL_AVRO_INGEST = r"""
SELECT source,
       COUNT(*) AS n_records,
       SUM(length(COALESCE(text, ''))) AS sum_text_chars,
       SUM(n_chars) AS sum_n_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# linear interpolation over a dense hourly grid
# ---------------------------------------------------------------------------


def _q_interp_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear time-series interpolation: per user, a dense hourly grid
    over the whole event span, hourly purchase totals where present,
    and straight-line interpolation between the surrounding observed
    hours elsewhere — the sensor/metrics resampling primitive one step
    up from q_gap_fill's LOCF.

    Spark shape: grid = distinct users × one exploded hour sequence
    (the 1-row bounds frame broadcasts); observed values left-join on
    (user, hour); prev/next observation via last/first IGNORE NULLS
    over one user-partitioned window each — a single shuffle on
    user_id.  Determinism: hourly totals are exact DECIMAL sums, the
    interpolation expression is written identically on both engines,
    and the per-user audit sums DECIMAL(18,4)-rounded values (exact,
    order-independent)."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["user_id", "ts", "event_type", "value"])
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(money("value")).cast("double").alias("v"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    ser = grid.join(hourly, ["user_id", "h"], "left")
    # both directions as unbounded-PRECEDING frames (the "next
    # observation" via last-ignorenulls over DESC ordering): Spark's
    # WindowExec evaluates unbounded-preceding frames incrementally but
    # recomputes unbounded-FOLLOWING frames from scratch per row —
    # O(partition²), measured 5x slower on this query at sf0.1
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    annotated = ser.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.last("v", ignorenulls=True).over(w_next).alias("nv"),
        F.last(obs_h, ignorenulls=True).over(w_next).alias("nh"),
    )
    eh = F.unix_timestamp("h").cast("double")
    ph = F.unix_timestamp("ph").cast("double")
    nh = F.unix_timestamp("nh").cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.col("pv") + (F.col("nv") - F.col("pv")) * ((eh - ph) / (nh - ph))
        )
    )
    return (
        annotated.withColumn("iv", interp)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_hours"),
            F.count("v").alias("n_observed"),
            (F.count("iv") - F.count("v")).alias("n_interp"),
            # fixed-point audit sum: floor(iv*1e4 + 0.5) is pure IEEE
            # arithmetic on identical bits (no engine-specific decimal
            # ROUND path), so the BIGINT sum is exactly reproducible
            F.sum(F.floor(F.col("iv") * 10000 + F.lit(0.5))).alias("sum_filled_e4"),
        )
        .orderBy("user_id")
    )


_SQL_INTERP_FILL = r"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1 FROM events
), hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h FROM bounds
), grid AS (
  SELECT u.user_id, hours.h
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN hours
), ser AS (
  SELECT g.user_id, g.h, hourly.v
  FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h
), annotated AS (
  SELECT user_id, h, v,
         LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS ph,
         FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wn AS nh
  FROM ser
  WINDOW wp AS (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), filled AS (
  SELECT user_id, h, v,
         CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NULL OR nv IS NULL THEN NULL
              ELSE pv + (nv - pv) * ((CAST(epoch(h) AS DOUBLE) - CAST(epoch(ph) AS DOUBLE))
                                     / (CAST(epoch(nh) AS DOUBLE) - CAST(epoch(ph) AS DOUBLE)))
         END AS iv
  FROM annotated
)
SELECT user_id,
       COUNT(*) AS n_hours,
       COUNT(v) AS n_observed,
       COUNT(iv) - COUNT(v) AS n_interp,
       CAST(SUM(CAST(FLOOR(iv * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_filled_e4
FROM filled
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# oracle-checkable HLL distinct sketch
# ---------------------------------------------------------------------------

_HLL_P = 8  # 2^8 = 256 buckets


def _q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch built from first principles as
    DataFrame algebra — unlike approx_count_distinct (whose HLL++ is an
    engine-internal black box), every step here is deterministic md5
    bit-slicing, so the SKETCH ITSELF carries a full oracle: bucket =
    first 2 hex chars, rho = leading-zero bits of the next 56 + 1, one
    max-rho per bucket, Flajolet's raw estimate with the small-range
    correction.  The 2^-rho sum runs in exact DECIMAL (scaled 2^57) —
    double summation would be order-dependent.

    Scale shape: one hash-aggregate to 256 rows, then a 1-row reduce —
    the mergeable-sketch plan (per-partition partial max-rho IS the
    sketch merge).  Output: raw/corrected estimates + exact NDV + the
    observed relative error."""
    m = 1 << _HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["user_id"])
    h = ev.select(F.md5(F.col("user_id").cast("string")).alias("hx")).distinct()
    rest = F.substring("hx", 3, 14)
    zchars = F.length(F.regexp_extract(rest, "^0*", 0))
    # first non-zero hex char after the zero run
    first_nz = F.expr("substr(substr(hx, 3, 14), length(regexp_extract(substr(hx, 3, 14), '^0*', 0)) + 1, 1)")
    extra = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(zchars == 14, F.lit(57)).otherwise(zchars * 4 + extra + 1)
    buckets = (
        h.select(
            F.conv(F.substring("hx", 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    # exact integer 2^(57 - max_rho) per bucket, summed in DECIMAL
    agg = buckets.agg(
        F.sum(F.pow(F.lit(2.0), F.lit(57) - F.col("max_rho")).cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("nonzero"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_ndv"))
    est_raw = (
        F.lit(alpha * m * m)
        / ((F.col("s").cast("double") + (F.lit(m) - F.col("nonzero")) * F.pow(F.lit(2.0), F.lit(57)))
           / F.pow(F.lit(2.0), F.lit(57)))
    )
    v = F.lit(m) - F.col("nonzero")  # empty buckets
    corrected = F.when(
        (est_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(est_raw)
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.round(est_raw, 2).alias("est_raw"),
            F.round(corrected, 2).alias("est"),
            "exact_ndv",
            F.round(
                F.abs(corrected - F.col("exact_ndv")) / F.col("exact_ndv"), 3
            ).alias("rel_err"),
        )
    )


def _sql_hll_sketch() -> str:
    m = 1 << _HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return rf"""
WITH h AS (
  SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
), r AS (
  SELECT CAST(('0x' || substr(hx, 1, 2)) AS INTEGER) AS bucket,
         length(regexp_extract(substr(hx, 3, 14), '^0*')) AS zchars,
         substr(substr(hx, 3, 14),
                length(regexp_extract(substr(hx, 3, 14), '^0*')) + 1, 1) AS fnz
  FROM h
), rho_t AS (
  SELECT bucket,
         CASE WHEN zchars = 14 THEN 57
              ELSE zchars * 4 + CASE WHEN fnz = '1' THEN 3
                                     WHEN fnz IN ('2','3') THEN 2
                                     WHEN fnz IN ('4','5','6','7') THEN 1
                                     ELSE 0 END + 1 END AS rho
  FROM r
), b AS (
  SELECT bucket, MAX(rho) AS max_rho FROM rho_t GROUP BY bucket
), agg AS (
  SELECT SUM(CAST(POWER(2, 57 - max_rho) AS DECIMAL(38,0))) AS s,
         COUNT(*) AS nonzero
  FROM b
), est AS (
  SELECT CAST({alpha!r} AS DOUBLE) * {m} * {m}
         / ((CAST(s AS DOUBLE) + ({m} - nonzero) * POWER(2, 57)) / POWER(2, 57)) AS est_raw,
         {m} - nonzero AS v
  FROM agg
), ex AS (SELECT COUNT(DISTINCT user_id) AS exact_ndv FROM events)
SELECT ROUND(est_raw, 2) AS est_raw,
       ROUND(CASE WHEN est_raw <= 2.5 * {m} AND v > 0
                  THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / v)
                  ELSE est_raw END, 2) AS est,
       exact_ndv,
       ROUND(abs(CASE WHEN est_raw <= 2.5 * {m} AND v > 0
                      THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / v)
                      ELSE est_raw END - exact_ndv) / exact_ndv, 3) AS rel_err
FROM est, ex
"""


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def _q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier over (p_retailprice minimize, p_size
    maximize): the preference-query operator (cheapest part at every
    size level nothing else beats on both axes).

    Spark shape: the O(n log n) sweep — aggregate to distinct value
    pairs, per-price best size, one ordered cummax window with a
    1-preceding lag; NOT the quadratic NOT-EXISTS.  The oracle is
    deliberately the opposite formulation (DuckDB brute-force
    NOT EXISTS over the definition), so agreement checks the sweep's
    semantics rather than mirroring it."""
    cat = Catalog(sf_dir)
    part = scan(spark, cat, "part", ["p_retailprice", "p_size"])
    pts = part.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).agg(F.count("*").alias("n"))
    per_price = pts.groupBy(F.col("price").alias("sp_price")).agg(
        F.max("size").alias("best_size")
    )
    w = Window.orderBy("sp_price").rowsBetween(Window.unboundedPreceding, -1)
    sky = per_price.withColumn("prev_best", F.max("best_size").over(w)).filter(
        F.col("prev_best").isNull() | (F.col("best_size") > F.col("prev_best"))
    )
    return (
        sky.join(
            pts,
            (F.col("sp_price") == F.col("price")) & (F.col("best_size") == F.col("size")),
        )
        .select("price", "size", "n")
        .orderBy("price", "size")
    )


_SQL_SKYLINE = r"""
WITH pts AS (
  SELECT p_retailprice AS price, p_size AS size, COUNT(*) AS n
  FROM part GROUP BY 1, 2
)
SELECT price, size, n FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.price <= a.price AND b.size >= a.size
    AND (b.price < a.price OR b.size > a.size)
)
ORDER BY price, size
"""


# ---------------------------------------------------------------------------
# data-expectations validation gate
# ---------------------------------------------------------------------------


def _q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over lineitem — the
    validation gate a pipeline runs before promoting a snapshot: range
    checks, set membership, cross-column ordering, non-null keys.
    One scan, all rules as parallel conditional aggregates (no
    per-rule passes); emitted long-form (rule, n_violations,
    pass_rate) so new rules never change the schema."""
    cat = Catalog(sf_dir)
    li = scan(
        spark,
        cat,
        "lineitem",
        ["l_orderkey", "l_quantity", "l_discount", "l_shipdate",
         "l_returnflag", "l_linestatus", "l_extendedprice", "l_tax"],
    )
    rules = [
        ("quantity_in_1_50", ~F.col("l_quantity").between(1, 50)),
        ("discount_in_0_0.10", ~F.col("l_discount").between(0.0, 0.10)),
        ("price_positive", F.col("l_extendedprice") <= 0),
        ("returnflag_in_set", ~F.col("l_returnflag").isin("A", "N", "R")),
        ("linestatus_in_set", ~F.col("l_linestatus").isin("O", "F")),
        ("orderkey_not_null", F.col("l_orderkey").isNull()),
        ("shipdate_in_range", ~F.col("l_shipdate").between("1992-01-01", "1998-12-31")),
        ("tax_in_0_0.08", ~F.col("l_tax").between(0.0, 0.08)),
    ]
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(cond.cast("long")).alias(f"r{i}") for i, (_, cond) in enumerate(rules)
    ]
    wide = li.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (rule, n_violations)".format(
        n=len(rules),
        args=", ".join(f"'{name}', r{i}" for i, (name, _) in enumerate(rules)),
    )
    return wide.select(
        F.expr(stack_expr), F.col("n_rows")
    ).select(
        "rule",
        "n_violations",
        F.round(1.0 - F.col("n_violations") / F.col("n_rows"), 6).alias("pass_rate"),
    ).orderBy("rule")


_SQL_EXPECTATIONS = r"""
WITH wide AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS v_qty,
         SUM(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.10) THEN 1 ELSE 0 END) AS v_disc,
         SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price,
         SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v_flag,
         SUM(CASE WHEN l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS v_status,
         SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_key,
         SUM(CASE WHEN NOT (l_shipdate BETWEEN '1992-01-01' AND '1998-12-31') THEN 1 ELSE 0 END) AS v_ship,
         SUM(CASE WHEN NOT (l_tax BETWEEN 0.0 AND 0.08) THEN 1 ELSE 0 END) AS v_tax
  FROM lineitem
)
SELECT rule, n_violations, ROUND(1.0 - n_violations / n_rows, 6) AS pass_rate
FROM (
  SELECT 'quantity_in_1_50' AS rule, v_qty AS n_violations, n_rows FROM wide
  UNION ALL SELECT 'discount_in_0_0.10', v_disc, n_rows FROM wide
  UNION ALL SELECT 'price_positive', v_price, n_rows FROM wide
  UNION ALL SELECT 'returnflag_in_set', v_flag, n_rows FROM wide
  UNION ALL SELECT 'linestatus_in_set', v_status, n_rows FROM wide
  UNION ALL SELECT 'orderkey_not_null', v_key, n_rows FROM wide
  UNION ALL SELECT 'shipdate_in_range', v_ship, n_rows FROM wide
  UNION ALL SELECT 'tax_in_0_0.08', v_tax, n_rows FROM wide
)
ORDER BY rule
"""


# ---------------------------------------------------------------------------
# SCD type-2 history build
# ---------------------------------------------------------------------------


def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: each
    user's event_type stream collapses into validity versions (a new
    version at every state CHANGE, valid_from = change ts, valid_to =
    next change ts, open-ended for the current state) — the dimension-
    history pattern every warehouse load needs.

    Spark shape: lag() to detect changes + lead() to close intervals,
    both over ONE (user_id, ts) window partitioning — a single
    shuffle.  Per-user audit keeps output bounded: version count,
    distinct states, closed-version dwell seconds (exact integer
    arithmetic), and the current open state."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["user_id", "ts", "event_id", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
    )
    return (
        versions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_versions"),
            F.countDistinct("event_type").alias("n_states"),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.unix_micros("valid_to") - F.unix_micros("valid_from"),
                )
            ).alias("closed_dwell_us"),
            F.max(
                F.when(
                    F.col("valid_to").isNull(),
                    F.col("event_type"),
                )
            ).alias("current_state"),
        )
        .orderBy("user_id")
    )


_SQL_SCD2 = r"""
WITH changes AS (
  SELECT user_id, ts, event_id, event_type
  FROM (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NULL OR prev_type <> event_type
), versions AS (
  SELECT user_id, event_type, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
)
SELECT user_id,
       COUNT(*) AS n_versions,
       COUNT(DISTINCT event_type) AS n_states,
       SUM(CASE WHEN valid_to IS NOT NULL
                THEN epoch_us(valid_to) - epoch_us(valid_from)
           END) AS closed_dwell_us,
       MAX(CASE WHEN valid_to IS NULL THEN event_type END) AS current_state
FROM versions
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

_WS_PER_SOURCE = 10
_WS_SALT = "ws1"


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    style, with the engine's no-RNG convention: u = md5-derived
    uniform in (0,1), key = ln(u)/w (equivalent to ranking u^(1/w)),
    top-10 per source by key — longer documents proportionally more
    likely, yet bit-reproducible across runs, partitionings and
    engines.  The per-epoch corpus-sampling primitive when weights
    come from quality/length scores.

    Spark shape: narrow map to compute keys + one row_number window
    per source.  Both engines derive u from the SAME first 15 md5 hex
    chars, so the double keys are bit-identical and the selected ROWS
    match exactly (keys themselves stay out of the output)."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "source", "n_chars"])
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_WS_SALT))), 1, 15), 16, 10)
        .cast("double")
        / F.pow(F.lit(2.0), F.lit(60))
    )
    key = F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("source").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        docs.withColumn("k", key)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WS_PER_SOURCE)
        .select("source", "doc_id", "n_chars", F.col("rn").cast("int").alias("rn"))
        .orderBy("source", "rn")
    )


def _sql_weighted_sample() -> str:
    return rf"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_WS_SALT}'), 1, 15)) AS BIGINT) / POWER(2, 60))
         / CAST(n_chars AS DOUBLE) AS k
  FROM documents
), ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
  FROM keyed
)
SELECT source, doc_id, n_chars, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= {_WS_PER_SOURCE}
ORDER BY source, rn
"""


# ---------------------------------------------------------------------------
# deterministic correlation matrix + OLS via exact decimal moments
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric
    columns — computed from EXACT DECIMAL moment sums (Sx, Sxx, Sxy)
    so the result is bit-reproducible across engines and
    partitionings, unlike corr()'s double accumulation (the same
    canonicalization strategy as the engine's money aggregates,
    applied to second moments).

    Scale shape: ONE scan with 14 parallel decimal sums (no per-pair
    passes, no shuffle beyond the single aggregate), then a 1-row
    expansion to long form."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", _CORR_COLS)
    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(money(c)).alias(f"s_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:]
    ]
    for a, b in pairs:
        aggs.append(F.sum(money(a) * money(b)).alias(f"s_{a}_{b}"))
    wide = li.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sx = F.col(f"s_{a}").cast("double")
        sy = F.col(f"s_{b}").cast("double")
        sxy = F.col(f"s_{a}_{b}").cast("double")
        sxx = F.col(f"s_{a}_{a}").cast("double")
        syy = F.col(f"s_{b}_{b}").cast("double")
        return (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))

    # one exploded array over the single 1-row aggregate — a
    # union-of-selects here would re-run the scan once per pair
    entries = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(corr_expr(a, b), 6).alias("corr"),
            F.col("n").alias("n"),
        )
        for a, b in pairs
        if a != b
    ]
    return (
        wide.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.col_a", "e.col_b", "e.corr", "e.n")
        .orderBy("col_a", "col_b")
    )


def _sql_corr_matrix() -> str:
    sums = ",\n         ".join(
        [f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}" for c in _CORR_COLS]
    )
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:]]
    psums = ",\n         ".join(
        f"SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS s_{a}_{b}"
        for a, b in pairs
    )
    selects = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            if a == b:
                continue
            selects.append(
                f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
  ROUND((CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)
         - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(s_{a}_{a} AS DOUBLE)
                - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(s_{b}_{b} AS DOUBLE)
                  - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6) AS corr,
  n FROM wide"""
            )
    body = "\nUNION ALL ".join(selects)
    return f"""
WITH wide AS (
  SELECT COUNT(*) AS n,
         {sums},
         {psums}
  FROM lineitem
)
{body}
ORDER BY col_a, col_b
"""


def _q_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit (extendedprice ~ quantity, grouped by
    returnflag) via the normal equations over exact DECIMAL moments —
    distributed linear regression as pure DataFrame algebra, with the
    same bit-reproducibility argument as q_corr_matrix.  One grouped
    aggregate; slope/intercept/r² derived on 3 rows."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    x, y = money("l_quantity"), money("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r * r, 6).alias("r2"),
    ).orderBy("l_returnflag")


_SQL_OLS = r"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
  FROM lineitem GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
  FROM m
), fit AS (
  SELECT l_returnflag, n,
         (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope,
         (nd * sxyd - sxd * syd)
           / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) AS r
  FROM d
)
SELECT fit.l_returnflag, fit.n,
       ROUND(slope, 6) AS slope,
       ROUND((d.syd - slope * d.sxd) / d.nd, 4) AS intercept,
       ROUND(r * r, 6) AS r2
FROM fit JOIN d ON d.l_returnflag = fit.l_returnflag
ORDER BY fit.l_returnflag
"""


# ---------------------------------------------------------------------------
# KMV distinct sketch + sketch-union set algebra
# ---------------------------------------------------------------------------

_KMV_K = 64


def _q_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketches with SKETCH-LEVEL set
    algebra: KMV sketches of the click-user and purchase-user sets,
    plus their union estimated by MERGING the sketches (k smallest of
    the combined hash sets) — the mergeable-summary pattern that lets
    per-partition / per-day sketches roll up without re-scanning raw
    data.  md5-derived hashes keep it RNG-free, so the sketch — like
    q_hll_sketch — carries a full oracle.

    est = (k-1)/h_k (h_k = k-th smallest normalized hash), or the
    exact count when the set is smaller than k (the sketch holds it
    whole).  Output long-form per set with the exact NDV and observed
    relative error alongside."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["user_id", "event_type"])

    def hashes(et: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == et)
            .select("user_id")
            .distinct()
            .select(
                (
                    F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
                    .cast("double")
                    / F.pow(F.lit(2.0), F.lit(60))
                ).alias("u")
            )
        )

    def sketch_est(h: DataFrame, name: str, exact: DataFrame) -> DataFrame:
        topk = h.orderBy("u").limit(_KMV_K)
        agg = topk.agg(F.count("*").alias("kk"), F.max("u").alias("hk"))
        est = F.when(
            F.col("kk") < _KMV_K, F.col("kk").cast("double")
        ).otherwise((F.lit(_KMV_K) - 1) / F.col("hk"))
        return (
            agg.crossJoin(F.broadcast(exact))
            .select(
                F.lit(name).alias("set_name"),
                F.round(est, 2).alias("est"),
                F.col("exact_ndv"),
                F.round(F.abs(est - F.col("exact_ndv")) / F.col("exact_ndv"), 3).alias(
                    "rel_err"
                ),
            )
        )

    clicks, purch = hashes("click"), hashes("purchase")
    ex_c = ev.filter(F.col("event_type") == "click").agg(
        F.countDistinct("user_id").alias("exact_ndv")
    )
    ex_p = ev.filter(F.col("event_type") == "purchase").agg(
        F.countDistinct("user_id").alias("exact_ndv")
    )
    ex_u = ev.filter(F.col("event_type").isin("click", "purchase")).agg(
        F.countDistinct("user_id").alias("exact_ndv")
    )
    merged = clicks.unionByName(purch).distinct()
    return (
        sketch_est(clicks, "click", ex_c)
        .unionByName(sketch_est(purch, "purchase", ex_p))
        .unionByName(sketch_est(merged, "union", ex_u))
        .orderBy("set_name")
    )


def _sql_kmv_union() -> str:
    k = _KMV_K
    return rf"""
WITH hc AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  / POWER(2, 60) AS u
  FROM events WHERE event_type = 'click'
), hp AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  / POWER(2, 60) AS u
  FROM events WHERE event_type = 'purchase'
), hu AS (
  SELECT u FROM hc UNION SELECT u FROM hp
), tc AS (SELECT u FROM hc ORDER BY u LIMIT {k}),
tp AS (SELECT u FROM hp ORDER BY u LIMIT {k}),
tu AS (SELECT u FROM hu ORDER BY u LIMIT {k}),
ac AS (SELECT COUNT(*) AS kk, MAX(u) AS hk FROM tc),
ap AS (SELECT COUNT(*) AS kk, MAX(u) AS hk FROM tp),
au AS (SELECT COUNT(*) AS kk, MAX(u) AS hk FROM tu),
ec AS (SELECT COUNT(DISTINCT user_id) AS exact_ndv FROM events WHERE event_type = 'click'),
ep AS (SELECT COUNT(DISTINCT user_id) AS exact_ndv FROM events WHERE event_type = 'purchase'),
eu AS (SELECT COUNT(DISTINCT user_id) AS exact_ndv FROM events
       WHERE event_type IN ('click', 'purchase')),
rows_t AS (
  SELECT 'click' AS set_name,
         CASE WHEN ac.kk < {k} THEN CAST(ac.kk AS DOUBLE) ELSE ({k} - 1) / ac.hk END AS est,
         ec.exact_ndv FROM ac, ec
  UNION ALL
  SELECT 'purchase',
         CASE WHEN ap.kk < {k} THEN CAST(ap.kk AS DOUBLE) ELSE ({k} - 1) / ap.hk END,
         ep.exact_ndv FROM ap, ep
  UNION ALL
  SELECT 'union',
         CASE WHEN au.kk < {k} THEN CAST(au.kk AS DOUBLE) ELSE ({k} - 1) / au.hk END,
         eu.exact_ndv FROM au, eu
)
SELECT set_name, ROUND(est, 2) AS est, exact_ndv,
       ROUND(abs(est - exact_ndv) / exact_ndv, 3) AS rel_err
FROM rows_t
ORDER BY set_name
"""


# ---------------------------------------------------------------------------
# partition checksums (table-sync / anti-entropy audit)
# ---------------------------------------------------------------------------


def _q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent partition checksums over documents: rows
    bucket by doc_id % 16; each bucket's checksum is the exact-DECIMAL
    sum of a per-row md5 key over ALL columns — the Merkle-leaf /
    anti-entropy primitive for comparing table replicas or validating
    a migration without moving data (mismatched buckets localize the
    diff).  Commutative sum ⇒ partitioning- and order-invariant;
    identical md5 arithmetic on both engines ⇒ full oracle."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    row_key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    F.coalesce(F.col("text"), F.lit("")),
                    F.coalesce(F.col("lang"), F.lit("")),
                    F.coalesce(F.col("source"), F.lit("")),
                    F.col("n_chars").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        docs.groupBy((F.col("doc_id") % 16).alias("bucket"))
        .agg(F.count("*").alias("n_rows"), F.sum(row_key).alias("checksum"))
        .orderBy("bucket")
    )


_SQL_TABLE_CHECKSUM = r"""
SELECT doc_id % 16 AS bucket,
       COUNT(*) AS n_rows,
       SUM(CAST(CAST(('0x' || substr(md5(
             CAST(doc_id AS VARCHAR) || '|' ||
             COALESCE(text, '') || '|' ||
             COALESCE(lang, '') || '|' ||
             COALESCE(source, '') || '|' ||
             CAST(n_chars AS VARCHAR)), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS checksum
FROM documents
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# PPJoin prefix-filtered exact Jaccard
# ---------------------------------------------------------------------------


def _q_ngram_jaccard_pp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ngram_jaccard's exact semantics through PPJoin prefix
    filtering (llm/dedup.py:ngram_jaccard_ppjoin): only each doc's
    rarest |d|-ceil(t|d|)+1 shingles are indexed, eliminating
    hot-shingle quadratic blowup structurally (a boilerplate shingle
    sorts last and enters no prefixes) with ZERO recall loss by the
    prefix theorem.  Same full oracle as the plain inverted-index
    form — the driver checks the optimization changed nothing."""
    from dbt_lab_spark.llm.dedup import ngram_jaccard_ppjoin

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text"])
    return ngram_jaccard_ppjoin(docs, shingle_k=3, threshold=0.5)


def _sql_ngram_jaccard_pp() -> str:
    from dbt_lab_spark.workload_beyond import _SQL_NGRAM_JACCARD

    return _SQL_NGRAM_JACCARD


# ---------------------------------------------------------------------------
# autocorrelation over the hourly event series
# ---------------------------------------------------------------------------

_ACF_LAGS = [1, 2, 3, 24]


def _q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1, 2,
    3 and 24 — the seasonality probe run before choosing a forecasting
    window.  The series is INTEGER counts, so every moment sum is
    exact and the Pearson ratio is bit-reproducible (the q_corr_matrix
    argument, applied to a lagged self-join via one lead() window).

    Spark shape: one hourly aggregate, one ordered window for the four
    leads, one 1-row moment reduce per lag (all in a single
    aggregate)."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["ts"])
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("x")
    )
    w = Window.orderBy("h")
    with_leads = hourly.select(
        "x", *[F.lead("x", lag).over(w).alias(f"y{lag}") for lag in _ACF_LAGS]
    )
    aggs = []
    for lag in _ACF_LAGS:
        y = F.col(f"y{lag}")
        cond = y.isNotNull()
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n{lag}"),
            F.sum(F.when(cond, F.col("x"))).alias(f"sx{lag}"),
            F.sum(F.when(cond, y)).alias(f"sy{lag}"),
            F.sum(F.when(cond, F.col("x") * F.col("x"))).alias(f"sxx{lag}"),
            F.sum(F.when(cond, F.col("x") * y)).alias(f"sxy{lag}"),
            F.sum(F.when(cond, y * y)).alias(f"syy{lag}"),
        ]
    m = with_leads.agg(*aggs)
    entries = []
    for lag in _ACF_LAGS:
        n = F.col(f"n{lag}").cast("double")
        sx = F.col(f"sx{lag}").cast("double")
        sy = F.col(f"sy{lag}").cast("double")
        sxx = F.col(f"sxx{lag}").cast("double")
        sxy = F.col(f"sxy{lag}").cast("double")
        syy = F.col(f"syy{lag}").cast("double")
        acf = (n * sxy - sx * sy) / F.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        entries.append(
            F.struct(
                F.lit(lag).alias("lag"),
                F.col(f"n{lag}").alias("n"),
                F.round(acf, 6).alias("acf"),
            )
        )
    return (
        m.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.lag", "e.n", "e.acf")
        .orderBy("lag")
    )


def _sql_acf() -> str:
    lag_cols = []
    for lag in _ACF_LAGS:
        lag_cols.append(f"LEAD(x, {lag}) OVER (ORDER BY h) AS y{lag}")
    selects = []
    for lag in _ACF_LAGS:
        selects.append(
            f"""SELECT {lag} AS lag, n, ROUND((nd * sxyd - sxd * syd)
        / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6) AS acf
FROM (SELECT COUNT(y{lag}) AS n,
             CAST(COUNT(y{lag}) AS DOUBLE) AS nd,
             CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN x END) AS DOUBLE) AS sxd,
             CAST(SUM(y{lag}) AS DOUBLE) AS syd,
             CAST(SUM(CASE WHEN y{lag} IS NOT NULL THEN x * x END) AS DOUBLE) AS sxxd,
             CAST(SUM(x * y{lag}) AS DOUBLE) AS sxyd,
             CAST(SUM(y{lag} * y{lag}) AS DOUBLE) AS syyd
      FROM leads)"""
        )
    body = "\nUNION ALL ".join(selects)
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1
), leads AS (
  SELECT x, {', '.join(lag_cols)} FROM hourly
)
{body}
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (hybrid lexical + vector retrieval)
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 20
_RRF_POOL = 100


def _q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with embedding
    cosine ranking by reciprocal-rank fusion (rrf = Σ 1/(60+rank)) —
    the standard RAG-stack combiner of a keyword index and a vector
    index.  Query: the fixed BM25 terms on the lexical side, vec 0's
    embedding on the vector side; doc_id aligns with vec_id.

    Determinism: both ranks are row_number over scores ROUNDED first
    (4dp BM25 / 6dp cosine) — discretizing before ranking removes the
    cross-engine ulp hazard that raw-double ordering deep in a ranking
    carries; ties then break on id.  Each list pools its top-100, the
    fusion is a full outer join on id, output is the fused top-20."""
    from dbt_lab_spark.functions.text import bm25_scores
    from dbt_lab_spark.functions.vectors import cosine_similarity, to_double_array
    from dbt_lab_spark.workload_beyond import _BM25_TERMS

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text"])
    emb = scan(spark, cat, "embeddings", ["vec_id", "embedding"]).select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    lex = bm25_scores(docs, _BM25_TERMS)
    wl = Window.orderBy(F.desc("score_r"), F.asc("doc_id"))
    lex_ranked = (
        lex.withColumn("score_r", F.round("score", 4))
        .withColumn("r_lex", F.row_number().over(wl))
        .filter(F.col("r_lex") <= _RRF_POOL)
        .select("doc_id", "r_lex")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    wv = Window.orderBy(F.desc("cos_r"), F.asc("vec_id"))
    vec_ranked = (
        emb.filter(F.col("vec_id") >= 1)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine_similarity(F.col("v"), F.col("qv")), 6).alias("cos_r"))
        .withColumn("r_vec", F.row_number().over(wv))
        .filter(F.col("r_vec") <= _RRF_POOL)
        .select(F.col("vec_id").alias("doc_id"), "r_vec")
    )
    fused = lex_ranked.join(vec_ranked, "doc_id", "full_outer").select(
        "doc_id",
        F.col("r_lex"),
        F.col("r_vec"),
        (
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(_RRF_TOP)
        .select("doc_id", "r_lex", "r_vec", F.round("rrf", 6).alias("rrf"))
    )


def _sql_rrf() -> str:
    from dbt_lab_spark.workload_beyond import _BM25_TERMS

    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
  WHERE tok IN ({terms}) GROUP BY doc_id, tok
), idf AS (
  SELECT tok, ln((stats.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
  FROM (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok), stats
), lex AS (
  SELECT tf.doc_id,
         ROUND(SUM(idf.idf * (tf.tf * (1.2 + 1)) /
             (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 4) AS score_r
  FROM tf
  JOIN idf ON idf.tok = tf.tok
  JOIN dl ON dl.doc_id = tf.doc_id, stats
  GROUP BY tf.doc_id
), lex_ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_r DESC, doc_id) AS r_lex
  FROM lex QUALIFY r_lex <= {_RRF_POOL}
), qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), vec AS (
  SELECT vec_id AS doc_id,
         ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(qv, qv))), 6) AS cos_r
  FROM embeddings, qv WHERE vec_id >= 1
), vec_ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_r DESC, doc_id) AS r_vec
  FROM vec QUALIFY r_vec <= {_RRF_POOL}
), fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
         COALESCE(1.0 / ({_RRF_K} + l.r_lex), 0.0)
         + COALESCE(1.0 / ({_RRF_K} + v.r_vec), 0.0) AS rrf
  FROM lex_ranked l FULL OUTER JOIN vec_ranked v ON v.doc_id = l.doc_id
)
SELECT doc_id, r_lex, r_vec, ROUND(rrf, 6) AS rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_RRF_TOP}
"""


# ---------------------------------------------------------------------------
# snapshot-log time travel
# ---------------------------------------------------------------------------


def _q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-log round-trip (plans/snapshots.py): commit documents
    as v0, delta-append a synthetic recrawl batch as v1 (O(batch)
    commit — v0's files are never rewritten), then time-travel read
    BOTH versions and audit each.  The oracle recomputes both
    versions' audits straight from `documents` — equality proves the
    log's file-set bookkeeping loses and duplicates nothing.

    The per-version audits are collected eagerly (≤2 rows) so the
    scratch table can be deleted before returning; everything heavy
    (the commits, the audited scans) runs distributed."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "source", "n_chars"])
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.lit("recrawl").alias("source"),
        "n_chars",
    )
    d = tempfile.mkdtemp(prefix="snap_tt_")
    try:
        t = SnapshotTable(d)
        t.commit(docs)
        t.append(batch)
        rows = []
        for v in (0, 1):
            r = (
                t.read(spark, version=v)
                .agg(
                    F.count("*").alias("n_docs"),
                    F.countDistinct("source").alias("n_sources"),
                    F.sum("n_chars").alias("sum_chars"),
                )
                .first()
            )
            rows.append((v, r.n_docs, r.n_sources, r.sum_chars))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_df(spark, 
        rows, "version int, n_docs bigint, n_sources bigint, sum_chars bigint"
    )


_SQL_TIME_TRAVEL = r"""
WITH v1 AS (
  SELECT doc_id, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 5000000, 'recrawl', n_chars FROM documents WHERE doc_id % 5 = 0
)
SELECT CAST(0 AS INTEGER) AS version, COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources, SUM(n_chars) AS sum_chars
FROM documents
UNION ALL
SELECT 1, COUNT(*), COUNT(DISTINCT source), SUM(n_chars) FROM v1
ORDER BY version
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit + Gini concentration
# ---------------------------------------------------------------------------


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over lineitem extended prices —
    the classic fabricated-data screen: natural multiplicative
    quantities put digit d at log10(1+1/d) frequency, and a synthetic
    or truncated column shows up as a flat profile.  One scan, one
    9-row aggregate; observed share and the Benford expectation ride
    side-by-side with the absolute deviation."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", ["l_extendedprice"])
    digit = F.substring(F.col("l_extendedprice").cast("decimal(18,2)").cast("string"), 1, 1)
    counts = (
        li.filter(F.col("l_extendedprice") > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    expected = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("observed"),
            F.round(expected, 6).alias("benford"),
            F.round(F.abs(F.col("n") / F.col("t") - expected), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


_SQL_BENFORD = r"""
WITH counts AS (
  SELECT substr(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS digit,
         COUNT(*) AS n
  FROM lineitem WHERE l_extendedprice > 0
  GROUP BY 1
), t AS (SELECT SUM(n) AS t FROM counts)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / t, 6) AS observed,
       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford,
       ROUND(abs(CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS abs_dev
FROM counts, t
ORDER BY digit
"""


def _q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of revenue across customers — the
    source-diversity/inequality metric a corpus pipeline tracks per
    domain (here on the star schema's natural money column).  Computed
    by the rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over
    revenue-sorted customers: ranks are integers, revenue sums exact
    DECIMAL, so the ratio is bit-reproducible.  One aggregate + one
    global-rank window over CUSTOMERS (already reduced from the fact
    table — the q_skyline posture)."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_custkey", "o_totalprice"])
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(money("o_totalprice")).alias("rev")
    )
    w = Window.orderBy(F.asc("rev"), F.asc("o_custkey"))
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rev").cast("double").alias("sx"),
        F.sum(F.col("i") * F.col("rev")).cast("double").alias("six"),
    )
    n = F.col("n").cast("double")
    gini = 2.0 * F.col("six") / (n * F.col("sx")) - (n + 1.0) / n
    return agg.select(
        "n",
        F.round(F.col("sx"), 2).alias("total_rev"),
        F.round(gini, 6).alias("gini"),
    )


_SQL_GINI = r"""
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i FROM per_cust
), agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(rev) AS DOUBLE) AS sx,
         CAST(SUM(i * rev) AS DOUBLE) AS six
  FROM ranked
)
SELECT n, ROUND(sx, 2) AS total_rev,
       ROUND(2.0 * six / (CAST(n AS DOUBLE) * sx)
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM agg
"""


# ---------------------------------------------------------------------------
# PDF text-extraction round trip
# ---------------------------------------------------------------------------

_PDF_TOKENS_PER_LINE = 10
_PDF_LINES_PER_PAGE = 5


def _q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document ingestion through real PDF bytes (llm/pdf.py): every
    document is typeset into a conforming multi-page PDF (10 tokens
    per line, 5 lines per page, FlateDecode content streams) and the
    text is EXTRACTED BACK by the structural parser — both directions
    inside one Arrow mapInPandas stage, so what the aggregate sees
    went through genuine object/xref/stream/Tj machinery.

    Full oracle: every line/page join replaces exactly one original
    token gap, so DuckDB recomputes the page counts, extracted byte
    length, and token count straight from `documents` — equality
    proves extraction lost nothing."""
    from collections.abc import Iterator

    import pandas as pd

    from dbt_lab_spark.llm.pdf import encode_pdf, pdf_text

    cat = Catalog(sf_dir)
    # Fan out the single-row-group scan so the per-row round-trip
    # mapInPandas stage runs in parallel Python workers (guide 2.4/4).
    docs = fan_out_if_small(
        scan(spark, cat, "documents", ["doc_id", "source", "text"])
    )

    def _round_trip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf_batch["doc_id"], pdf_batch["source"], pdf_batch["text"]
            ):
                toks = ("" if text is None else str(text)).split()
                lines = [
                    " ".join(toks[i : i + _PDF_TOKENS_PER_LINE])
                    for i in range(0, len(toks), _PDF_TOKENS_PER_LINE)
                ]
                pages = [
                    lines[i : i + _PDF_LINES_PER_PAGE]
                    for i in range(0, len(lines), _PDF_LINES_PER_PAGE)
                ]
                blob = encode_pdf(pages, compress=True)
                extracted = pdf_text(blob)
                rows.append((int(doc_id), str(source), len(pages), extracted))
            yield pd.DataFrame(
                rows, columns=["doc_id", "source", "n_pages", "extracted"]
            )

    extracted = docs.mapInPandas(
        _round_trip, "doc_id long, source string, n_pages int, extracted string"
    )
    return (
        extracted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pages").alias("n_pages"),
            F.sum(F.length("extracted")).alias("sum_chars"),
            F.sum(
                F.size(F.split(F.col("extracted"), r"\s+"))
                - (F.length(F.trim(F.col("extracted"))) == 0).cast("int")
            ).alias("sum_tokens"),
        )
        .orderBy("source")
    )


_SQL_PDF_EXTRACT = rf"""
WITH d AS (
  SELECT source,
         len(string_split_regex(trim(COALESCE(text, '')), '\s+'))
           - CASE WHEN trim(COALESCE(text, '')) = '' THEN 1 ELSE 0 END AS n_toks,
         length(array_to_string(string_split_regex(trim(COALESCE(text, '')), '\s+'), ' ')) AS norm_len
  FROM documents
), per_doc AS (
  SELECT source, n_toks,
         CASE WHEN n_toks = 0 THEN 0 ELSE norm_len END AS ext_len,
         CAST(ceil(CAST(ceil(CAST(n_toks AS DOUBLE) / {_PDF_TOKENS_PER_LINE}) AS DOUBLE)
                   / {_PDF_LINES_PER_PAGE}) AS BIGINT) AS n_pages
  FROM d
)
SELECT source,
       COUNT(*) AS n_docs,
       SUM(n_pages) AS n_pages,
       SUM(ext_len) AS sum_chars,
       SUM(n_toks) AS sum_tokens
FROM per_doc
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# HTML boilerplate-removal round trip
# ---------------------------------------------------------------------------

_HTML_TOKENS_PER_PARA = 15
_HTML_MIN_CHARS = 20


def _q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-page main-content extraction (llm/html.py): every document
    is rendered into a realistic page — nav/footer link chrome,
    script/style noise, escaped entities — then the link-density
    extractor recovers the content, all inside one Arrow stage.  What
    the aggregate sees passed through a real HTMLParser and the real
    jusText-style keep rule (len ≥ 20 chars AND link density < 0.5).

    Full oracle: the chrome is all links (density ≥ 0.5 ⇒ dropped) and
    content paragraphs are link-free (kept iff long enough), so DuckDB
    recomputes kept-paragraph counts and extracted byte totals from
    `documents` alone — equality proves the parser dropped exactly the
    boilerplate and nothing else."""
    from collections.abc import Iterator

    import pandas as pd

    from dbt_lab_spark.llm.html import encode_html, extract_main_text

    cat = Catalog(sf_dir)
    # Fan out the single-row-group scan so the per-row round-trip
    # mapInPandas stage runs in parallel Python workers (guide 2.4/4).
    docs = fan_out_if_small(
        scan(spark, cat, "documents", ["doc_id", "source", "text"])
    )

    def _round_trip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf_batch["doc_id"], pdf_batch["source"], pdf_batch["text"]
            ):
                toks = ("" if text is None else str(text)).split()
                paras = [
                    " ".join(toks[i : i + _HTML_TOKENS_PER_PARA])
                    for i in range(0, len(toks), _HTML_TOKENS_PER_PARA)
                ]
                page = encode_html(str(source), paras)
                extracted = extract_main_text(page, min_chars=_HTML_MIN_CHARS)
                n_kept = len(extracted.split("\n")) if extracted else 0
                rows.append((int(doc_id), str(source), n_kept, extracted))
            yield pd.DataFrame(
                rows, columns=["doc_id", "source", "n_kept", "extracted"]
            )

    extracted = docs.mapInPandas(
        _round_trip, "doc_id long, source string, n_kept int, extracted string"
    )
    return (
        extracted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_kept").alias("n_paras_kept"),
            F.sum(F.length("extracted")).alias("sum_chars"),
        )
        .orderBy("source")
    )


_SQL_HTML_EXTRACT = rf"""
WITH toks AS (
  SELECT doc_id, source,
         string_split_regex(trim(COALESCE(text, '')), '\s+') AS t
  FROM documents
  WHERE trim(COALESCE(text, '')) <> ''
), pos AS (
  SELECT doc_id, source, unnest(t) AS tok,
         unnest(range(len(t))) // {_HTML_TOKENS_PER_PARA} AS para
  FROM toks
), paras AS (
  SELECT doc_id, source, para,
         SUM(length(tok)) + COUNT(*) - 1 AS para_len
  FROM pos GROUP BY 1, 2, 3
), kept AS (
  SELECT doc_id, source,
         COUNT(*) AS n_kept,
         SUM(para_len) AS kept_chars
  FROM paras WHERE para_len >= {_HTML_MIN_CHARS}
  GROUP BY 1, 2
), per_doc AS (
  SELECT d.doc_id, d.source,
         COALESCE(k.n_kept, 0) AS n_kept,
         CASE WHEN COALESCE(k.n_kept, 0) = 0 THEN 0
              ELSE k.kept_chars + k.n_kept - 1 END AS ext_chars
  FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       SUM(n_kept) AS n_paras_kept,
       SUM(ext_chars) AS sum_chars
FROM per_doc
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# DOCX round trip
# ---------------------------------------------------------------------------

_DOCX_TOKENS_PER_PARA = 12


def _q_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Office document ingestion through real .docx packages
    (llm/docx.py): every document is packaged — ZIP container,
    content types, namespaced OOXML body — and the text extracted
    back by the ElementTree parser, both inside one Arrow stage.

    Full oracle: paragraph joins replace token gaps 1:1 (the PDF/HTML
    round-trip argument), so DuckDB recomputes paragraph counts,
    extracted byte length, and token totals from `documents` —
    equality proves the package machinery lost nothing."""
    from collections.abc import Iterator

    import pandas as pd

    from dbt_lab_spark.llm.docx import docx_text, encode_docx

    cat = Catalog(sf_dir)
    # Fan out the single-row-group scan so the per-row round-trip
    # mapInPandas stage runs in parallel Python workers (guide 2.4/4).
    docs = fan_out_if_small(
        scan(spark, cat, "documents", ["doc_id", "source", "text"])
    )

    def _round_trip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf_batch["doc_id"], pdf_batch["source"], pdf_batch["text"]
            ):
                toks = ("" if text is None else str(text)).split()
                paras = [
                    " ".join(toks[i : i + _DOCX_TOKENS_PER_PARA])
                    for i in range(0, len(toks), _DOCX_TOKENS_PER_PARA)
                ]
                extracted = docx_text(encode_docx(paras))
                rows.append((int(doc_id), str(source), len(paras), extracted))
            yield pd.DataFrame(rows, columns=["doc_id", "source", "n_paras", "extracted"])

    extracted = docs.mapInPandas(
        _round_trip, "doc_id long, source string, n_paras int, extracted string"
    )
    return (
        extracted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_paras").alias("n_paras"),
            F.sum(F.length("extracted")).alias("sum_chars"),
        )
        .orderBy("source")
    )


_SQL_DOCX_EXTRACT = rf"""
WITH d AS (
  SELECT source,
         len(string_split_regex(trim(COALESCE(text, '')), '\s+'))
           - CASE WHEN trim(COALESCE(text, '')) = '' THEN 1 ELSE 0 END AS n_toks,
         length(array_to_string(string_split_regex(trim(COALESCE(text, '')), '\s+'), ' ')) AS norm_len
  FROM documents
), per_doc AS (
  SELECT source,
         CAST(ceil(CAST(n_toks AS DOUBLE) / {_DOCX_TOKENS_PER_PARA}) AS BIGINT) AS n_paras,
         CASE WHEN n_toks = 0 THEN 0 ELSE norm_len END AS ext_len
  FROM d
)
SELECT source, COUNT(*) AS n_docs, SUM(n_paras) AS n_paras, SUM(ext_len) AS sum_chars
FROM per_doc
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Jupyter-notebook round trip (pure JVM JSON path)
# ---------------------------------------------------------------------------

_IPYNB_TOKENS_PER_CELL = 8


def _q_ipynb_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-corpus ingestion through notebook JSON: every document
    becomes an .ipynb-shaped payload (cells alternating markdown/code)
    via to_json, then is parsed BACK with from_json and exploded —
    the whole round trip stays in JVM expressions (to_json/from_json/
    transform/explode), no Python anywhere: the nbformat-ingestion
    shape at zero UDF cost.

    Full oracle: cell boundaries replace token gaps 1:1 and parity
    decides the cell type, so DuckDB recomputes per-source cell counts
    and char totals from `documents` — equality proves the JSON
    encode/decode path preserved every cell."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "source", "text"])
    k = _IPYNB_TOKENS_PER_CELL
    cells_expr = f"""
    transform(
      sequence(0, int(ceil(size(t) / {k}.0)) - 1),
      i -> struct(
        IF(i % 2 = 0, 'markdown', 'code') AS cell_type,
        array_join(slice(t, i * {k} + 1, {k}), ' ') AS source
      )
    )
    """
    nb = docs.select(
        "doc_id",
        F.col("source").alias("corpus_source"),
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+").alias("t"),
    ).filter(F.trim(F.coalesce(F.array_join("t", " "), F.lit(""))) != "").select(
        "doc_id",
        "corpus_source",
        F.to_json(
            F.struct(
                F.lit(4).alias("nbformat"),
                F.expr(cells_expr).alias("cells"),
            )
        ).alias("nb_json"),
    )
    schema = "struct<nbformat: int, cells: array<struct<cell_type: string, source: string>>>"
    parsed = nb.select(
        "doc_id",
        "corpus_source",
        F.explode(F.from_json("nb_json", schema).getField("cells")).alias("cell"),
    )
    return (
        parsed.groupBy(F.col("corpus_source").alias("source"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum((F.col("cell.cell_type") == "code").cast("long")).alias("n_code_cells"),
            F.sum((F.col("cell.cell_type") == "markdown").cast("long")).alias("n_md_cells"),
            F.sum(
                F.when(F.col("cell.cell_type") == "code", F.length("cell.source")).otherwise(0)
            ).alias("code_chars"),
            F.sum(
                F.when(F.col("cell.cell_type") == "markdown", F.length("cell.source")).otherwise(0)
            ).alias("md_chars"),
        )
        .orderBy("source")
    )


_SQL_IPYNB_EXTRACT = rf"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(COALESCE(text, '')), '\s+') AS t
  FROM documents
  WHERE trim(COALESCE(text, '')) <> ''
), pos AS (
  SELECT doc_id, source, unnest(t) AS tok,
         unnest(range(len(t))) // {_IPYNB_TOKENS_PER_CELL} AS cell
  FROM toks
), cells AS (
  SELECT doc_id, source, cell,
         CASE WHEN cell % 2 = 0 THEN 'markdown' ELSE 'code' END AS cell_type,
         SUM(length(tok)) + COUNT(*) - 1 AS cell_len
  FROM pos GROUP BY 1, 2, 3
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       SUM(CASE WHEN cell_type = 'code' THEN 1 ELSE 0 END) AS n_code_cells,
       SUM(CASE WHEN cell_type = 'markdown' THEN 1 ELSE 0 END) AS n_md_cells,
       SUM(CASE WHEN cell_type = 'code' THEN cell_len ELSE 0 END) AS code_chars,
       SUM(CASE WHEN cell_type = 'markdown' THEN cell_len ELSE 0 END) AS md_chars
FROM cells
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# precision/recall/F1 operating points (classifier-evaluation family)
# ---------------------------------------------------------------------------

_PR_THRESHOLDS = [round(0.1 * i, 1) for i in range(1, 10)]


def _q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the heuristic quality score as a
    lang=='en' classifier at nine fixed thresholds, in ONE pass: 27
    conditional sums inside a single hash aggregate (map-side
    combinable), then a 9-row stack() unpivot — never a thresholds x
    rows fan-out.  All ratios are single IEEE divisions over exact
    integer counts, so values are engine-exact (rounded to 6
    defensively).  Completes the eval family next to q_auc_eval /
    q_calibration with the thresholded operating-point view.
    Reference capability evidence: aggregate surface,
    TestPhysicalOperatorsIIIStudents.java:231-299."""
    from dbt_lab_spark.functions.text import quality_score

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "lang"])
    scored = docs.select(
        quality_score("text").alias("q"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    aggs = []
    for i, t in enumerate(_PR_THRESHOLDS):
        pred = F.col("q") >= F.lit(float(t))
        aggs.append(
            F.sum(F.when(pred & (F.col("label") == 1), 1).otherwise(0))
            .cast("long").alias(f"tp{i}")
        )
        aggs.append(
            F.sum(F.when(pred & (F.col("label") == 0), 1).otherwise(0))
            .cast("long").alias(f"fp{i}")
        )
        aggs.append(
            F.sum(F.when((~pred) & (F.col("label") == 1), 1).otherwise(0))
            .cast("long").alias(f"fn{i}")
        )
    wide = scored.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), tp{i}, fp{i}, fn{i}"
        for i, t in enumerate(_PR_THRESHOLDS)
    )
    rows = wide.select(
        F.expr(f"stack({len(_PR_THRESHOLDS)}, {stack_args}) AS (t, tp, fp, fn)")
    )
    return rows.select(
        "t",
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))), 6
        ).alias("prec"),
        F.round(
            F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))), 6
        ).alias("rec"),
        F.round(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ),
            6,
        ).alias("f1"),
    ).orderBy("t")


def _sql_pr_curve() -> str:
    from dbt_lab_spark.workload_beyond import _SQL_QSCORE_PERDOC

    ts = ", ".join(f"CAST({t} AS DOUBLE)" for t in _PR_THRESHOLDS)
    return rf"""
WITH {_SQL_QSCORE_PERDOC},
th AS (SELECT unnest([{ts}]) AS t),
agg AS (
  SELECT t,
         SUM(CASE WHEN q >= t AND label = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN q >= t AND label = 0 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN q < t AND label = 1 THEN 1 ELSE 0 END) AS fn
  FROM qscore, th
  GROUP BY t
)
SELECT t, tp, fp, fn,
       round(CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END, 6) AS prec,
       round(CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END, 6) AS rec,
       round(CASE WHEN 2 * tp + fp + fn > 0
                  THEN 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1
FROM agg
ORDER BY t
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust trend over the hourly rollup
# ---------------------------------------------------------------------------


def _q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the hourly money-exact value series:
    slope = exact-discrete lower median over all hour-pair slopes
    (yj - yi)/(hj - hi); intercept = the same median rule over per-hour
    residuals y - slope*h.  The pair join runs on the ROLLED-UP series
    (hours^2, bounded by the rollup grain, not the event volume — the
    same audit-scale shape as q_mann_kendall), and medians pick rank
    (n+1)//2 of the value-ordered multiset, so both engines select the
    same element.  Slopes are single IEEE divisions of exact decimal
    diffs by integer hour gaps -> bit-identical cross-engine.
    Reference capability evidence: join + aggregate surface,
    qexec/PhysicalOperators (TestPhysicalOperatorsIIIStudents.java)."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("ts", "value")
    hourly = (
        ev.select(
            F.floor(F.unix_millis("ts") / F.lit(3600000.0)).cast("long").alias("h"),
            money("value").alias("v"),
        )
        .groupBy("h")
        .agg(F.sum("v").alias("y"))
    )
    n = hourly.count()
    n_pairs = n * (n - 1) // 2
    k_slope = (n_pairs + 1) // 2
    k_icept = (n + 1) // 2
    a = hourly.select(F.col("h").alias("hi"), F.col("y").alias("yi"))
    b = hourly.select(F.col("h").alias("hj"), F.col("y").alias("yj"))
    pairs = a.join(b, F.col("hi") < F.col("hj")).select(
        (
            (F.col("yj") - F.col("yi")).cast("double")
            / (F.col("hj") - F.col("hi")).cast("double")
        ).alias("slope")
    )
    med = (
        pairs.withColumn("rn", F.row_number().over(Window.orderBy("slope")))
        .filter(F.col("rn") == k_slope)
        .select(F.col("slope").alias("m"))
    )
    resid = hourly.crossJoin(F.broadcast(med)).select(
        "m",
        (F.col("y").cast("double") - F.col("m") * F.col("h").cast("double")).alias("r"),
    )
    out = (
        resid.withColumn("rn", F.row_number().over(Window.orderBy("r")))
        .filter(F.col("rn") == k_icept)
    )
    return out.select(
        F.round("m", 6).alias("slope"),
        F.round("r", 4).alias("intercept"),
        F.lit(n).cast("bigint").alias("n_hours"),
        F.lit(n_pairs).cast("bigint").alias("n_pairs"),
    )


_SQL_THEIL_SEN = """
WITH hourly AS (
  SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h,
         SUM(CAST(value AS DECIMAL(18,2))) AS y
  FROM events GROUP BY 1
), pairs AS (
  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope
  FROM hourly a JOIN hourly b ON a.h < b.h
), ps AS (
  SELECT slope, row_number() OVER (ORDER BY slope) AS rn, COUNT(*) OVER () AS np
  FROM pairs
), med AS (
  SELECT slope AS m FROM ps WHERE rn = (np + 1) // 2
), resid AS (
  SELECT CAST(y AS DOUBLE) - (SELECT m FROM med) * CAST(h AS DOUBLE) AS r
  FROM hourly
), rs AS (
  SELECT r, row_number() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS nh
  FROM resid
)
SELECT round((SELECT m FROM med), 6) AS slope,
       round((SELECT r FROM rs WHERE rn = (nh + 1) // 2), 4) AS intercept,
       (SELECT COUNT(*) FROM hourly) AS n_hours,
       (SELECT COUNT(*) FROM pairs) AS n_pairs
"""


# ---------------------------------------------------------------------------
# ridge regression (2 features + unpenalized intercept, closed form)
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 10.0


def _q_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression of order total price on (line
    count, total quantity) with an unpenalized intercept: solve
    (X'X + lambda*diag(0,1,1)) beta = X'y by Cramer's rule on the 3x3
    normal equations.  The moment sums are EXACT (integer counts and
    DECIMAL(18,2) products — the q_corr_matrix canonicalization), cast
    to double once, and the Cramer expressions are written with
    identical parenthesization in both engines, so every double op
    matches bit-for-bit (rounded to 6 defensively).  Scale shape: one
    join + one hash aggregate to 10 moments; the solve is O(1) on one
    row.  The multi-feature step past q_ols's single-feature form.
    Reference capability evidence: aggregate + join surface,
    TestPhysicalOperatorsIIIStudents.java:231-299."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"])
    li = scan(spark, cat, "lineitem", ["l_orderkey", "l_quantity"])
    per = orders.join(
        li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
            F.count(F.lit(1)).alias("x1"),
            F.sum(money("l_quantity")).alias("x2"),
        ),
        "o_orderkey",
    ).select("x1", "x2", money("o_totalprice").alias("y"))
    m = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    lam = F.lit(_RIDGE_LAMBDA)
    a11 = F.col("n").cast("double")
    a12 = F.col("s1").cast("double")
    a13 = F.col("s2").cast("double")
    a22 = F.col("s11").cast("double") + lam
    a23 = F.col("s12").cast("double")
    a33 = F.col("s22").cast("double") + lam
    b1 = F.col("sy").cast("double")
    b2 = F.col("s1y").cast("double")
    b3 = F.col("s2y").cast("double")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    return m.select(
        F.round(det0 / det, 6).alias("beta0"),
        F.round(det1 / det, 6).alias("beta1"),
        F.round(det2 / det, 6).alias("beta2"),
        F.lit(_RIDGE_LAMBDA).alias("lam"),
        F.col("n").cast("bigint").alias("n"),
    )


def _sql_ridge() -> str:
    lam = _RIDGE_LAMBDA
    return f"""
WITH per AS (
  SELECT l.x1, l.x2, CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders o JOIN (
    SELECT l_orderkey, COUNT(*) AS x1,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS x2
    FROM lineitem GROUP BY 1
  ) l ON l.l_orderkey = o.o_orderkey
), m AS (
  SELECT COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2,
         SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
         SUM(y) AS sy, SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y
  FROM per
), d AS (
  SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
         CAST(s2 AS DOUBLE) AS a13,
         CAST(s11 AS DOUBLE) + {lam} AS a22, CAST(s12 AS DOUBLE) AS a23,
         CAST(s22 AS DOUBLE) + {lam} AS a33,
         CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
         CAST(s2y AS DOUBLE) AS b3, n
  FROM m
)
SELECT round((b1 * (a22 * a33 - a23 * a23)
              - a12 * (b2 * a33 - a23 * b3)
              + a13 * (b2 * a23 - a22 * b3))
             / (a11 * (a22 * a33 - a23 * a23)
                - a12 * (a12 * a33 - a23 * a13)
                + a13 * (a12 * a23 - a22 * a13)), 6) AS beta0,
       round((a11 * (b2 * a33 - a23 * b3)
              - b1 * (a12 * a33 - a23 * a13)
              + a13 * (a12 * b3 - b2 * a13))
             / (a11 * (a22 * a33 - a23 * a23)
                - a12 * (a12 * a33 - a23 * a13)
                + a13 * (a12 * a23 - a22 * a13)), 6) AS beta1,
       round((a11 * (a22 * b3 - b2 * a23)
              - a12 * (a12 * b3 - b2 * a13)
              + b1 * (a12 * a23 - a22 * a13))
             / (a11 * (a22 * a33 - a23 * a23)
                - a12 * (a12 * a33 - a23 * a13)
                + a13 * (a12 * a23 - a22 * a13)), 6) AS beta2,
       CAST({lam} AS DOUBLE) AS lam,
       CAST(n AS BIGINT) AS n
FROM d
"""


# ---------------------------------------------------------------------------
# deterministic Poisson bootstrap CI for the mean
# ---------------------------------------------------------------------------

_BOOT_B = 40
_BOOT_SALT = "boot1"
# Cumulative Poisson(1) CDF at k = 0..5 (weights above 6 are truncated);
# repr()-exact literals so both engines parse the identical doubles.
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]
# discrete percentile ranks for the 2.5% / 97.5% bounds over B means
_BOOT_LO_K = (_BOOT_B + 39) // 40          # ceil(0.025 * B)
_BOOT_HI_K = (39 * _BOOT_B + 39) // 40     # ceil(0.975 * B)


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order total, via
    the POISSON bootstrap — the resampling scheme that works on
    distributed data: each (order, resample b) pair gets an i.i.d.-ish
    Poisson(1) replication weight derived from an md5 hash (the
    engine's no-RNG convention), so no global with-replacement sample
    is ever materialized and the whole thing is one fan-out x B=40 and
    one hash aggregate.  Resample means use exact decimal sums and a
    single IEEE division; the CI takes exact-discrete percentile ranks
    over the 40 means — every value engine-reproducible bit-for-bit.
    Reference capability evidence: aggregate surface,
    TestPhysicalOperatorsIIIStudents.java:231-299."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        "o_orderkey", money("o_totalprice").alias("y")
    )
    # spread the xB fan-out + md5 stage across all cores: a single input
    # file otherwise pins the 6M-row hash stage to one partition (at
    # cluster scale orders is already many splits and this is a no-op
    # cost — a narrow 2-column shuffle)
    orders = orders.repartition(spark.sparkContext.defaultParallelism, "o_orderkey")
    b = spark.range(_BOOT_B).select(F.col("id").cast("int").alias("b"))
    j = orders.crossJoin(F.broadcast(b))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                        F.lit(_BOOT_SALT),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.pow(F.lit(2.0), F.lit(60))
    )
    # project u ONCE: embedding `u` inside each branch of the CASE
    # chain makes Catalyst inline 6 copies of the md5/conv tree per row
    w = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS_CDF[k]), k).otherwise(w)
    means = (
        j.withColumn("u", u)
        .withColumn("w", w)
        .drop("u")
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("y")).alias("s"), F.sum("w").alias("nw"))
        .filter(F.col("nw") > 0)
        .select((F.col("s").cast("double") / F.col("nw")).alias("m"))
    )
    ranked = means.withColumn("rn", F.row_number().over(Window.orderBy("m")))
    ci = ranked.agg(
        F.min(F.when(F.col("rn") == _BOOT_LO_K, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == _BOOT_HI_K, F.col("m"))).alias("ci_hi"),
    )
    base = orders.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mean_hat"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        F.round("mean_hat", 6).alias("mean_hat"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
        F.lit(_BOOT_B).cast("int").alias("b_resamples"),
        "n_orders",
    )


def _sql_bootstrap_ci() -> str:
    cases = " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"""
WITH y AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS y FROM orders
), b AS (
  SELECT CAST(unnest(range({_BOOT_B})) AS INTEGER) AS b
), u AS (
  SELECT b.b, y.y,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                  || CAST(b.b AS VARCHAR) || '{_BOOT_SALT}'), 1, 15))
              AS BIGINT) / POWER(2, 60) AS u
  FROM y, b
), w AS (
  SELECT b, y, CASE {cases} ELSE 6 END AS w FROM u
), m AS (
  SELECT b, CAST(SUM(w * y) AS DOUBLE) / SUM(w) AS m
  FROM w GROUP BY b HAVING SUM(w) > 0
), r AS (
  SELECT m, row_number() OVER (ORDER BY m) AS rn FROM m
), base AS (
  SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mean_hat,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM y
)
SELECT round(mean_hat, 6) AS mean_hat,
       round((SELECT m FROM r WHERE rn = {_BOOT_LO_K}), 6) AS ci_lo,
       round((SELECT m FROM r WHERE rn = {_BOOT_HI_K}), 6) AS ci_hi,
       CAST({_BOOT_B} AS INTEGER) AS b_resamples,
       n_orders
FROM base
"""


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering for multi-dimensional data skipping
# ---------------------------------------------------------------------------

_Z_BITS = 12
_Z_BUCKETS_SHIFT = 18  # 24-bit z >> 18 -> 64 coarse layout buckets


def _q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit: interleave the bits of two
    query dimensions — order date (days since 1992-01-01) and total
    price (200-unit buckets from exact cents) — into one clustering
    key, then show per 64-bucket z-range the min/max span of BOTH
    dims.  This is the lakehouse multi-dim clustering trick: sorting
    files by z keeps min/max column stats tight on BOTH dims at once,
    so either predicate prunes files (repartitionByRange(z) at write
    time is the production path; the audit here proves the bound
    tightness).  Pure integer bit arithmetic -> engine-exact.
    Reference capability evidence: IndexScan range pruning,
    minidbs-core qexec IndexScanOperator."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    d = F.least(
        F.greatest(F.datediff("o_orderdate", F.lit("1992-01-01")), F.lit(0)),
        F.lit((1 << _Z_BITS) - 1),
    ).cast("long")
    cents = (money("o_totalprice") * 100).cast("long")
    p = F.least(F.floor(cents / F.lit(20000.0)), F.lit((1 << _Z_BITS) - 1)).cast("long")
    # same round-robin interleave the layout writer uses (d at bit 2i,
    # p at bit 2i+1), so this audit measures exactly write_zordered's key
    from dbt_lab_spark.sources import zorder_key

    z = zorder_key([d, p], bits=_Z_BITS)
    rows = orders.select(
        F.shiftright(z, _Z_BUCKETS_SHIFT).cast("long").alias("zbucket"),
        d.alias("d"),
        p.alias("p"),
    )
    return (
        rows.groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("d").alias("min_day"),
            F.max("d").alias("max_day"),
            F.min("p").alias("min_pb"),
            F.max("p").alias("max_pb"),
            (
                (F.max("d") - F.min("d") + 1) * (F.max("p") - F.min("p") + 1)
            ).alias("bbox_area"),
        )
        .orderBy("zbucket")
    )


def _sql_zorder() -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(((d >> {i}) & 1) << {2 * i})")
        terms.append(f"(((p >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    cap = (1 << _Z_BITS) - 1
    return f"""
WITH dims AS (
  SELECT least(greatest(datediff('day', DATE '1992-01-01',
                                 CAST(o_orderdate AS DATE)), 0), {cap}) AS d,
         least(CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          / 20000.0) AS BIGINT), {cap}) AS p
  FROM orders
), keyed AS (
  SELECT d, p, ({z}) >> {_Z_BUCKETS_SHIFT} AS zbucket FROM dims
)
SELECT CAST(zbucket AS BIGINT) AS zbucket, COUNT(*) AS n,
       MIN(d) AS min_day, MAX(d) AS max_day,
       MIN(p) AS min_pb, MAX(p) AS max_pb,
       (MAX(d) - MIN(d) + 1) * (MAX(p) - MIN(p) + 1) AS bbox_area
FROM keyed
GROUP BY zbucket
ORDER BY zbucket
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (hashed n-gram log-likelihood ratio)
# ---------------------------------------------------------------------------

_DSIR_B = 1024


def _q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    public): score every document by the log-likelihood ratio of its
    hashed n-gram features under the target distribution (here
    lang=='en' docs) vs the raw corpus, add-1 smoothed over 1024
    buckets, and select docs with score > 0 (more target-like than
    raw).  Scale shape: word-count explode -> (doc, idx) aggregate,
    a 1024-row feature-ratio table BROADCAST back, and exact-decimal
    score sums — no per-doc Python, no quadratic step.  Determinism:
    the only transcendental (ln of an exactly-shared double ratio) is
    rounded to 6 and fixed into DECIMAL(18,6), so per-doc scores are
    exact decimal sums — engine-identical.  Reference capability
    evidence: bulk-operator extension surface,
    mapred/qexec/examples/CountTuplesOperator.java:36-67."""
    from dbt_lab_spark.llm.classifier import hash_features

    cat = Catalog(sf_dir)
    # Fan out the tokenize/hash explode across cores when the scan
    # cannot split natively (size-gated, guide §2.4).
    docs = fan_out_if_small(
        scan(spark, cat, "documents", ["doc_id", "text", "lang", "source"])
    )
    feats = hash_features(docs, n_features=_DSIR_B)  # (doc_id, idx, tf)
    meta = docs.select(
        "doc_id", "source", (F.col("lang") == "en").cast("int").alias("is_t")
    )
    fl = feats.join(meta, "doc_id")
    per_feat = fl.groupBy("idx").agg(
        F.sum(F.when(F.col("is_t") == 1, F.col("tf")).otherwise(F.lit(0.0)))
        .cast("long")
        .alias("ct"),
        F.sum("tf").cast("long").alias("cr"),
    )
    tot = per_feat.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    rat = per_feat.crossJoin(F.broadcast(tot)).select(
        "idx",
        F.round(
            F.log(
                ((F.col("ct") + 1) * (F.col("tr") + _DSIR_B)).cast("double")
                / ((F.col("cr") + 1) * (F.col("tt") + _DSIR_B)).cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    scored = (
        fl.join(F.broadcast(rat), "idx")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("tf").cast("long") * F.col("lr")).alias("score"))
    )
    n_sel = F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_sel.cast("long").alias("n_selected"),
            F.round(
                F.when(
                    n_sel > 0,
                    F.sum(F.when(F.col("score") > 0, F.col("score"))).cast("double")
                    / n_sel,
                )
            , 4).alias("avg_sel_score"),
        )
        .orderBy("source")
    )


def _sql_dsir_sample() -> str:
    hex_to_int = " + ".join(
        f"(strpos('0123456789abcdef', m[{i}:{i}]) - 1) * {16 ** (15 - i)}"
        for i in range(1, 16)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
         string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id, source, is_t,
         list_concat(
           t,
           CASE WHEN len(t) < 2 THEN []
                ELSE [array_to_string(t[i:i+1], ' ') FOR i IN generate_series(1, len(t)-1)]
           END
         ) AS g
  FROM toks WHERE len(t) > 0
), hx AS (
  SELECT doc_id, source, is_t, md5(u.u) AS m FROM grams, unnest(g) AS u(u)
), feat AS (
  SELECT doc_id, source, is_t, ({hex_to_int}) % {_DSIR_B} AS idx FROM hx
), tf AS (
  SELECT doc_id, source, is_t, idx, COUNT(*) AS tf FROM feat GROUP BY 1, 2, 3, 4
), per_feat AS (
  SELECT idx, SUM(CASE WHEN is_t = 1 THEN tf ELSE 0 END) AS ct, SUM(tf) AS cr
  FROM tf GROUP BY 1
), tot AS (
  SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM per_feat
), rat AS (
  SELECT idx,
         CAST(round(ln(CAST((ct + 1) * (tr + {_DSIR_B}) AS DOUBLE)
                       / CAST((cr + 1) * (tt + {_DSIR_B}) AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS lr
  FROM per_feat, tot
), scored AS (
  SELECT doc_id, source, SUM(tf * lr) AS score
  FROM tf JOIN rat USING (idx) GROUP BY 1, 2
)
SELECT source, COUNT(*) AS n_docs,
       SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS n_selected,
       round(CASE WHEN SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) > 0
                  THEN CAST(SUM(CASE WHEN score > 0 THEN score END) AS DOUBLE)
                       / SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) END, 4) AS avg_sel_score
FROM scored
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# degree assortativity of the trade graph
# ---------------------------------------------------------------------------


def _q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed degree assortativity of the top-3 trade graph: Pearson
    correlation over edges of (out-degree of src, in-degree of dst) —
    do high-degree exporters ship to high-degree importers?  Degrees
    come from two hash aggregates broadcast back onto the edge list;
    the correlation uses exact integer moment sums and the engine's
    shared single-expression Pearson formula (q_corr_matrix
    convention), so the statistic is engine-exact (rounded to 6).
    Reference capability evidence: join + aggregate surface,
    TestPhysicalOperatorsIIIStudents.java:231-299."""
    edges = _trade_edges_topk(spark, sf_dir)
    dout = edges.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    din = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    exy = (
        edges.join(F.broadcast(dout), "src")
        .join(F.broadcast(din), "dst")
        .select("x", "y")
    )
    m = exy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        F.round(F.when(den > 0, (n * sxy - sx * sy) / den), 6).alias("assortativity"),
        F.col("n").cast("bigint").alias("n_edges"),
    )


_SQL_ASSORTATIVITY = rf"""
WITH {_SQL_TRADE_EDGES},
dout AS (SELECT src, COUNT(*) AS x FROM edges GROUP BY 1),
din AS (SELECT dst, COUNT(*) AS y FROM edges GROUP BY 1),
exy AS (
  SELECT dout.x, din.y
  FROM edges JOIN dout USING (src) JOIN din USING (dst)
), m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM exy
)
SELECT round(CASE WHEN sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) > 0
                  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END, 6) AS assortativity,
       CAST(n AS BIGINT) AS n_edges
FROM m
"""


# ---------------------------------------------------------------------------
# label propagation communities (synchronous, fixed unroll)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation on the
    undirected top-3 trade graph: every node starts labeled with its
    own id; each round it adopts the most frequent label among its
    neighbors (ties -> smallest label); isolated nodes keep theirs.
    Exactly _LPA_ROUNDS rounds, so the oracle UNROLLS the same update
    as chained CTEs — a fully deterministic, hash-matchable take on an
    iterative graph algorithm (the usual LPA nondeterminism comes from
    async order and random tie-breaks, both removed here).  Scale
    shape per round: one edge-labels join + one (node, label) count +
    one max-by pick — all hash-partitioned on node; rounds are bounded
    by the unroll, not the data.  Reference capability evidence:
    Hadoop bulk-operator iteration surface,
    mapred/qexec/examples/CountTuplesOperator.java:36-67."""
    edges = _trade_edges_topk(spark, sf_dir)
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("u")).union(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    ).distinct()
    nodes = und.select(F.col("v").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lab"))
    for _ in range(_LPA_ROUNDS):
        nbr = und.join(labels.withColumnRenamed("node", "u"), "u").select(
            "v", "lab"
        )
        counted = nbr.groupBy("v", "lab").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lab"))
        picked = (
            counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("node"), F.col("lab").alias("new_lab"))
        )
        labels = (
            labels.join(picked, "node", "left")
            .select("node", F.coalesce("new_lab", "lab").alias("lab"))
        )
    return (
        labels.groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("node").alias("min_node"))
        .orderBy("lab")
    )


def _sql_label_prop() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""
c{r} AS (
  SELECT und.v, {prev}.lab, COUNT(*) AS c
  FROM und JOIN {prev} ON und.u = {prev}.node
  GROUP BY 1, 2
), p{r} AS (
  SELECT v AS node, lab AS new_lab FROM (
    SELECT v, lab, ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn
    FROM c{r})
  WHERE rn = 1
), l{r} AS (
  SELECT {prev}.node, COALESCE(p{r}.new_lab, {prev}.lab) AS lab
  FROM {prev} LEFT JOIN p{r} USING (node)
)""")
        prev = f"l{r}"
    body = ",".join(rounds)
    return rf"""
WITH {_SQL_TRADE_EDGES},
und AS MATERIALIZED (
  SELECT src AS v, dst AS u FROM edges
  UNION
  SELECT dst AS v, src AS u FROM edges
), nodes AS (SELECT DISTINCT v AS node FROM und),
l0 AS (SELECT node, node AS lab FROM nodes),{body}
SELECT lab, COUNT(*) AS n_members, MIN(node) AS min_node
FROM {prev}
GROUP BY lab
ORDER BY lab
"""


# ---------------------------------------------------------------------------
# approximate quantiles under a tolerance-flag oracle
# ---------------------------------------------------------------------------

_AQ_PROBS = [0.25, 0.5, 0.75, 0.9, 0.99]
_AQ_ACC = 10_000  # rank error <= n / accuracy


def _q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (Greenwald-Khanna style
    percentile_approx) on lineitem prices — the sketch whose shuffle
    carries summaries, not values, which is how percentiles work at
    100 TB (the production form stops at the estimate).  Like
    q_approx_ndv, the ORACLE CONTRACT is a tolerance flag: the query
    computes the exact rank band [p - n/acc, p + n/acc] inline via two
    inverse-rank lookups and asserts the estimate's VALUE lies inside
    it; DuckDB recomputes the exact discrete percentiles and expects
    TRUE.  Output: per-quantile exact value + in-band flag."""
    cat = Catalog(sf_dir)
    li = scan(spark, cat, "lineitem", ["l_extendedprice"]).select(
        money("l_extendedprice").cast("double").alias("v")
    )
    n = li.count()
    if n == 0:
        approx = [None] * len(_AQ_PROBS)
    else:
        approx = li.agg(
            F.percentile_approx("v", _AQ_PROBS, _AQ_ACC).alias("a")
        ).collect()[0]["a"]
    w = Window.orderBy("v")
    ranked = li.withColumn("rn", F.row_number().over(w))
    checks = []
    for p, a in zip(_AQ_PROBS, approx):
        lo_rank = max(1, int(p * n) - (n // _AQ_ACC) - 1)
        hi_rank = min(n, int(p * n) + (n // _AQ_ACC) + 2) if n else 1
        exact_rank = min(max(1, int(-(-p * n // 1))), n) if n else 1  # ceil(p*n)
        checks.append(
            F.struct(
                F.lit(p).alias("p"),
                F.min(F.when(F.col("rn") == exact_rank, F.col("v"))).alias("exact_v"),
                (
                    (F.lit(a) >= F.min(F.when(F.col("rn") == lo_rank, F.col("v"))))
                    & (F.lit(a) <= F.min(F.when(F.col("rn") == hi_rank, F.col("v"))))
                ).alias("est_in_band")
                if a is not None
                else F.lit(None).cast("boolean").alias("est_in_band"),
            )
        )
    agg = ranked.agg(F.array(*checks).alias("qs"))
    return (
        agg.select(F.explode("qs").alias("q"))
        .select("q.p", "q.exact_v", "q.est_in_band")
        .orderBy("p")
    )


def _sql_approx_quantiles() -> str:
    ps = ", ".join(str(p) for p in _AQ_PROBS)
    return f"""
WITH v AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS v
  FROM lineitem
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n FROM v
), p AS (SELECT unnest([{ps}]) AS p)
SELECT p.p AS p,
       (SELECT v FROM ranked
        WHERE rn = least(greatest(1, CAST(ceil(p.p * (SELECT MAX(n) FROM ranked)) AS BIGINT)),
                         (SELECT MAX(n) FROM ranked))) AS exact_v,
       TRUE AS est_in_band
FROM p
ORDER BY p
"""


# ---------------------------------------------------------------------------
# population stability index (PSI) drift per source
# ---------------------------------------------------------------------------

_PSI_BINS = 10


def _q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of document length per source vs the
    whole corpus — the model-monitoring drift score (PSI < 0.1 stable,
    > 0.25 shifted): psi = sum_bins (p_src - p_all) * ln(p_src/p_all)
    over 10 fixed log-width n_chars bins, add-1 smoothed.  Scale
    shape: one hash aggregate to (source, bin) counts, tiny broadcast
    of the corpus bin row, one reduce per source.  Determinism: the
    DSIR convention — each ln() runs on an exactly-shared double and
    is rounded to 6 and frozen to DECIMAL, making the per-source sum
    an exact decimal reduce."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "source", "n_chars"])
    binned = docs.select(
        "source",
        F.least(
            F.floor(F.log2(F.col("n_chars").cast("double") + 1.0)).cast("int"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    sb = binned.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c"))
    stot = sb.groupBy("source").agg(F.sum("c").alias("ns"))
    ab = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("ca"))
    atot = ab.agg(F.sum("ca").alias("na"))
    # dense (source x bin) grid so zero-count bins still contribute
    grid = (
        stot.crossJoin(F.broadcast(ab.crossJoin(atot)))
        .join(sb, ["source", "bin"], "left")
        .select(
            "source",
            "bin",
            "ns",
            "na",
            "ca",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    # smoothed shares: (c+1)/(ns+BINS); ratio exactly shared -> ln -> round
    term = (
        (
            (F.col("c") + 1) / (F.col("ns") + _PSI_BINS)
            - (F.col("ca") + 1) / (F.col("na") + _PSI_BINS)
        )
        * F.round(
            F.log(
                ((F.col("c") + 1) * (F.col("na") + _PSI_BINS)).cast("double")
                / ((F.col("ca") + 1) * (F.col("ns") + _PSI_BINS)).cast("double")
            ),
            6,
        ).cast("decimal(18,6)")
    ).cast("decimal(28,12)")
    return (
        grid.select("source", term.alias("t"))
        .groupBy("source")
        .agg(F.round(F.sum("t").cast("double"), 6).alias("psi"))
        .orderBy("source")
    )


def _sql_psi() -> str:
    return f"""
WITH binned AS (
  SELECT source,
         least(CAST(floor(log2(CAST(n_chars AS DOUBLE) + 1.0)) AS INTEGER),
               {_PSI_BINS - 1}) AS bin
  FROM documents
), sb AS (
  SELECT source, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
), stot AS (
  SELECT source, SUM(c) AS ns FROM sb GROUP BY 1
), ab AS (
  SELECT bin, COUNT(*) AS ca FROM binned GROUP BY 1
), atot AS (
  SELECT SUM(ca) AS na FROM ab
), grid AS (
  SELECT stot.source, ab.bin, stot.ns, atot.na, ab.ca, COALESCE(sb.c, 0) AS c
  FROM stot CROSS JOIN ab CROSS JOIN atot
  LEFT JOIN sb ON sb.source = stot.source AND sb.bin = ab.bin
), terms AS (
  SELECT source,
         CAST((CAST(c + 1 AS DOUBLE) / (ns + {_PSI_BINS})
               - CAST(ca + 1 AS DOUBLE) / (na + {_PSI_BINS}))
              * CAST(round(ln(CAST((c + 1) * (na + {_PSI_BINS}) AS DOUBLE)
                               / CAST((ca + 1) * (ns + {_PSI_BINS}) AS DOUBLE)), 6)
                     AS DECIMAL(18,6)) AS DECIMAL(28,12)) AS t
  FROM grid
)
SELECT source, round(CAST(SUM(t) AS DOUBLE), 6) AS psi
FROM terms GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# sliding-window HLL rollup (mergeable sketches over time)
# ---------------------------------------------------------------------------

_HLLW_DAYS = 7


def _q_hll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct-user estimates from MERGED daily HLL
    sketches — the time-windowed rollup that makes sketches the 100 TB
    answer: the raw stream reduces once to (day, bucket, max_rho)
    daily sketches, and every window estimate is a max-merge of <= 7
    tiny sketch rows, never a re-scan of the raw data.  Same
    first-principles md5 bit-slice HLL as q_hll_sketch (so the sketch
    AND the merge carry a full oracle); exact windowed NDV + rel_err
    ride along per day.  The band join fans out only the 256-row-a-day
    sketch table, bounded by window length."""
    from dbt_lab_spark.functions.sketches import hll_day_sketch

    m = 1 << _HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("ts", "user_id")
    # the same helper the streaming path uses (stream==batch pinned)
    daily = hll_day_sketch(ev)
    keyed = ev.select(
        F.floor(F.unix_millis("ts") / F.lit(86400000.0)).cast("long").alias("day"),
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    ).distinct()
    days = daily.select("day").distinct()
    merged = (
        daily.alias("s")
        .join(
            days.alias("d"),
            (F.col("s.day") <= F.col("d.day"))
            & (F.col("s.day") > F.col("d.day") - _HLLW_DAYS),
        )
        .groupBy(F.col("d.day").alias("day"), "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    agg = merged.groupBy("day").agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(57) - F.col("max_rho")).cast("decimal(38,0)")
        ).alias("s"),
        F.count("*").alias("nonzero"),
    )
    exact = (
        keyed.alias("k")
        .join(
            days.alias("d"),
            (F.col("k.day") <= F.col("d.day"))
            & (F.col("k.day") > F.col("d.day") - _HLLW_DAYS),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("hx").alias("exact_ndv"))
    )
    est_raw = (
        F.lit(alpha * m * m)
        / (
            (
                F.col("s").cast("double")
                + (F.lit(m) - F.col("nonzero")) * F.pow(F.lit(2.0), F.lit(57))
            )
            / F.pow(F.lit(2.0), F.lit(57))
        )
    )
    v = F.lit(m) - F.col("nonzero")
    corrected = F.when(
        (est_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(est_raw)
    return (
        agg.join(exact, "day")
        .select(
            "day",
            F.round(corrected, 2).alias("est"),
            "exact_ndv",
            F.round(F.abs(corrected - F.col("exact_ndv")) / F.col("exact_ndv"), 3).alias(
                "rel_err"
            ),
        )
        .orderBy("day")
    )


def _sql_hll_window() -> str:
    m = 1 << _HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return rf"""
WITH keyed AS MATERIALIZED (
  SELECT DISTINCT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
         md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events
), r AS (
  SELECT day, CAST(('0x' || substr(hx, 1, 2)) AS INTEGER) AS bucket,
         length(regexp_extract(substr(hx, 3, 14), '^0*')) AS zchars,
         substr(substr(hx, 3, 14),
                length(regexp_extract(substr(hx, 3, 14), '^0*')) + 1, 1) AS fnz
  FROM keyed
), daily AS MATERIALIZED (
  SELECT day, bucket,
         MAX(CASE WHEN zchars = 14 THEN 57
                  ELSE zchars * 4 + CASE WHEN fnz = '1' THEN 3
                                         WHEN fnz IN ('2','3') THEN 2
                                         WHEN fnz IN ('4','5','6','7') THEN 1
                                         ELSE 0 END + 1 END) AS max_rho
  FROM r GROUP BY day, bucket
), days AS MATERIALIZED (SELECT DISTINCT day FROM daily),
merged AS (
  SELECT d.day AS day, s.bucket, MAX(s.max_rho) AS max_rho
  FROM daily s JOIN days d ON s.day <= d.day AND s.day > d.day - {_HLLW_DAYS}
  GROUP BY 1, 2
), agg AS (
  SELECT day, SUM(CAST(POWER(2, 57 - max_rho) AS DECIMAL(38,0))) AS s,
         COUNT(*) AS nonzero
  FROM merged GROUP BY day
), ex AS (
  SELECT d.day AS day, COUNT(DISTINCT k.hx) AS exact_ndv
  FROM keyed k JOIN days d ON k.day <= d.day AND k.day > d.day - {_HLLW_DAYS}
  GROUP BY 1
), est AS (
  SELECT day,
         CAST({alpha!r} AS DOUBLE) * {m} * {m}
         / ((CAST(s AS DOUBLE) + ({m} - nonzero) * POWER(2, 57)) / POWER(2, 57)) AS est_raw,
         {m} - nonzero AS v
  FROM agg
)
SELECT est.day AS day,
       ROUND(CASE WHEN est_raw <= 2.5 * {m} AND v > 0
                  THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / v)
                  ELSE est_raw END, 2) AS est,
       exact_ndv,
       ROUND(abs(CASE WHEN est_raw <= 2.5 * {m} AND v > 0
                      THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / v)
                      ELSE est_raw END - exact_ndv) / exact_ndv, 3) AS rel_err
FROM est JOIN ex ON ex.day = est.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# salted skew join under the driver gate
# ---------------------------------------------------------------------------


def _q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-deviation per event type via operators.joins.salted_join on
    the MOST skewed key in the corpus (5 event_type values over the
    whole events table — every key is a hot key): the per-type mean is
    joined back through the salted path (large side's key salted by
    content hash, small side exploded across the salt domain), which
    keeps every reducer bounded at corpus scale where a plain
    broadcast-less equi-join would straggle.  Salting must be
    result-invisible, so the ORACLE is the plain join — the driver
    gate now proves the skew machinery changes nothing.  Deviations
    are |v - mean| rounded to fixed point and summed in exact DECIMAL
    (mean is a single IEEE division of exact decimal sums)."""
    from dbt_lab_spark.operators.joins import salted_join

    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select(
        "event_type", money("value").alias("v")
    )
    dim = ev.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_v")
    )
    joined = salted_join(ev, dim, "event_type", salt_buckets=16)
    dev = F.round(F.abs(F.col("v").cast("double") - F.col("mean_v")), 4).cast(
        "decimal(18,4)"
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(dev).cast("double"), 2).alias("sum_abs_dev"),
            F.round(F.min("mean_v"), 6).alias("mean_v"),
        )
        .orderBy("event_type")
    )


_SQL_SALTED_JOIN = """
WITH ev AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
), dim AS (
  SELECT event_type, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_v
  FROM ev GROUP BY 1
)
SELECT ev.event_type AS event_type, COUNT(*) AS n,
       round(CAST(SUM(CAST(round(abs(CAST(ev.v AS DOUBLE) - dim.mean_v), 4)
                           AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_abs_dev,
       round(MIN(dim.mean_v), 6) AS mean_v
FROM ev JOIN dim ON ev.event_type = dim.event_type
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# grid-binned spatial nearest-neighbor join (haversine)
# ---------------------------------------------------------------------------

_GEO_CELL_DEG = 10  # grid cell size; search radius = the 3x3 neighborhood
_GEO_SALT_LAT, _GEO_SALT_LON = "geolat", "geolon"


def _geo_u(key: F.Column, salt: str) -> F.Column:
    """md5-uniform in [0,1) — the engine's no-RNG convention."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15), 16, 10
        ).cast("double")
        / F.pow(F.lit(2.0), F.lit(60))
    )


def _q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-binned spatial nearest-neighbor join: every customer gets
    deterministic (lat, lon) from the md5-uniform plane (±60° lat to
    dodge pole degeneracy), suppliers likewise; each customer searches
    ONLY its 10° grid cell and the 3x3 neighborhood (the bounded-radius
    contract of a production spatial join — candidates come from a cell
    equi-join, never a cross join), scores candidates by haversine
    distance, and keeps the nearest (rank on the ROUNDED distance with
    a supplier-key tie-break, so a last-ulp trig difference between
    engines cannot flip the argmin — the q_rrf trick).  Output: per
    customer nation, match count + exact-decimal sum and mean of
    nearest distances.  At 100 TB the cell id is the shuffle key and
    grid size trades replication (x9 here via the neighbor explode)
    against candidate fan-in — the standard geo-join design.
    Reference capability evidence: join + aggregate surface,
    TestPhysicalOperatorsIIIStudents.java:231-299."""
    cat = Catalog(sf_dir)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey"]).select(
        "c_custkey",
        "c_nationkey",
        (F.lit(-60.0) + 120.0 * _geo_u(F.col("c_custkey"), _GEO_SALT_LAT)).alias("lat"),
        (F.lit(-180.0) + 360.0 * _geo_u(F.col("c_custkey"), _GEO_SALT_LON)).alias("lon"),
    )
    supp = scan(spark, cat, "supplier", ["s_suppkey"]).select(
        "s_suppkey",
        (F.lit(-60.0) + 120.0 * _geo_u(F.col("s_suppkey"), _GEO_SALT_LAT)).alias("slat"),
        (F.lit(-180.0) + 360.0 * _geo_u(F.col("s_suppkey"), _GEO_SALT_LON)).alias("slon"),
    )
    cell = lambda lat, lon: (  # noqa: E731
        F.floor(lat / _GEO_CELL_DEG) * 100 + F.floor(lon / _GEO_CELL_DEG)
    )
    # customer side explodes its 3x3 neighborhood; supplier side is keyed
    # by its own cell -> plain equi-join on the cell id
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    cust_cells = cust.select(
        "c_custkey",
        "c_nationkey",
        "lat",
        "lon",
        F.explode(offs).alias("o"),
    ).select(
        "c_custkey",
        "c_nationkey",
        "lat",
        "lon",
        (
            (F.floor(F.col("lat") / _GEO_CELL_DEG) + F.col("o.dy")) * 100
            + (F.floor(F.col("lon") / _GEO_CELL_DEG) + F.col("o.dx"))
        ).alias("cell"),
    )
    supp_cells = supp.select(
        "s_suppkey", "slat", "slon", cell(F.col("slat"), F.col("slon")).alias("cell")
    )
    cand = cust_cells.join(F.broadcast(supp_cells), "cell")
    rad = F.lit(3.141592653589793 / 180.0)
    dphi = (F.col("slat") - F.col("lat")) * rad / 2
    dlmb = (F.col("slon") - F.col("lon")) * rad / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.col("lat") * rad) * F.cos(F.col("slat") * rad) * F.sin(dlmb) * F.sin(dlmb)
    )
    dist_km = 2 * 6371.0 * F.asin(F.sqrt(a))
    scored = cand.select(
        "c_custkey",
        "c_nationkey",
        "s_suppkey",
        F.round(dist_km, 4).cast("decimal(12,4)").alias("d"),
    )
    w = Window.partitionBy("c_custkey").orderBy("d", "s_suppkey")
    nearest = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_nationkey", "d")
    )
    return (
        nearest.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum("d").cast("double"), 2).alias("sum_km"),
            F.round(F.sum("d").cast("double") / F.count(F.lit(1)), 4).alias("avg_km"),
        )
        .orderBy("c_nationkey")
    )


def _sql_geo_nearest() -> str:
    u = lambda key, salt: (  # noqa: E731
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || '{salt}'), 1, 15)) AS BIGINT)"
        f" / POWER(2, 60)"
    )
    return f"""
WITH cust AS MATERIALIZED (
  SELECT c_custkey, c_nationkey,
         -60.0 + 120.0 * {u('c_custkey', _GEO_SALT_LAT)} AS lat,
         -180.0 + 360.0 * {u('c_custkey', _GEO_SALT_LON)} AS lon
  FROM customer
), supp AS MATERIALIZED (
  SELECT s_suppkey,
         -60.0 + 120.0 * {u('s_suppkey', _GEO_SALT_LAT)} AS slat,
         -180.0 + 360.0 * {u('s_suppkey', _GEO_SALT_LON)} AS slon
  FROM supplier
), offs AS (
  SELECT dy, dx FROM (SELECT unnest([-1, 0, 1]) AS dy), (SELECT unnest([-1, 0, 1]) AS dx)
), cust_cells AS (
  SELECT c_custkey, c_nationkey, lat, lon,
         (CAST(floor(lat / {_GEO_CELL_DEG}) AS BIGINT) + dy) * 100
         + (CAST(floor(lon / {_GEO_CELL_DEG}) AS BIGINT) + dx) AS cell
  FROM cust, offs
), supp_cells AS (
  SELECT s_suppkey, slat, slon,
         CAST(floor(slat / {_GEO_CELL_DEG}) AS BIGINT) * 100
         + CAST(floor(slon / {_GEO_CELL_DEG}) AS BIGINT) AS cell
  FROM supp
), cand AS (
  SELECT c.c_custkey, c.c_nationkey, s.s_suppkey,
         CAST(round(2 * 6371.0 * asin(sqrt(
             sin((s.slat - c.lat) * {3.141592653589793 / 180.0} / 2)
             * sin((s.slat - c.lat) * {3.141592653589793 / 180.0} / 2)
             + cos(c.lat * {3.141592653589793 / 180.0})
               * cos(s.slat * {3.141592653589793 / 180.0})
               * sin((s.slon - c.lon) * {3.141592653589793 / 180.0} / 2)
               * sin((s.slon - c.lon) * {3.141592653589793 / 180.0} / 2)
         )), 4) AS DECIMAL(12,4)) AS d
  FROM cust_cells c JOIN supp_cells s USING (cell)
), nearest AS (
  SELECT c_custkey, c_nationkey, d FROM (
    SELECT c_custkey, c_nationkey, d,
           ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d, s_suppkey) AS rn
    FROM cand)
  WHERE rn = 1
)
SELECT c_nationkey, COUNT(*) AS n_matched,
       round(CAST(SUM(d) AS DOUBLE), 2) AS sum_km,
       round(CAST(SUM(d) AS DOUBLE) / COUNT(*), 4) AS avg_km
FROM nearest
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# behavioral burstiness (inter-arrival coefficient)
# ---------------------------------------------------------------------------


def _q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness histogram of user behavior: per user, B =
    (sigma - mu)/(sigma + mu) over inter-arrival gaps (B -> -1
    periodic, 0 Poisson, +1 bursty — Goh & Barabasi 2008, public),
    bucketed to 0.1-wide bins.  Gaps are exact integer micros from one
    lag window; per-user moments are exact integer sums, so sigma/mu/B
    are fixed double expressions — engine-identical.  One user_id
    shuffle + one tiny histogram aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    # integer SECONDS: micros gaps overflow long when squared (a
    # month-long gap is ~2.6e12 us -> 7e24 squared); seconds keep the
    # sum of squares comfortably inside 2^63 with no burstiness impact
    sec = F.expr("unix_micros(ts) div 1000000")
    gaps = (
        ev.select("user_id", (sec - F.lag(sec).over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    m = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).alias("ss"),
    ).filter(F.col("n") >= 2)
    n = F.col("n").cast("double")
    mu = F.col("s").cast("double") / n
    var = (n * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")) / (n * n)
    sigma = F.sqrt(var)
    b = F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)).otherwise(F.lit(0.0))
    binned = m.select(
        F.greatest(
            F.lit(-10), F.least(F.lit(9), F.floor(b * 10).cast("int"))
        ).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("bin")
    )


_SQL_BURSTINESS = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
         - lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events
), g AS (
  SELECT user_id, gap FROM gaps WHERE gap IS NOT NULL
), m AS (
  SELECT user_id, COUNT(*) AS n, SUM(gap) AS s, SUM(gap * gap) AS ss
  FROM g GROUP BY 1 HAVING COUNT(*) >= 2
), b AS (
  SELECT CASE WHEN sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
              + CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
         THEN (sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / (sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 + CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         ELSE 0.0 END AS bv
  FROM m
)
SELECT greatest(-10, least(9, CAST(floor(bv * 10) AS INTEGER))) AS bin,
       COUNT(*) AS n_users
FROM b
GROUP BY 1
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Markov entropy rate of the event-type process
# ---------------------------------------------------------------------------


def _q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = -sum_{s,t} (c_st / total) * ln(c_st / c_s) — how predictable
    is the next event given the current one (the sequence-modeling
    complement to q_entropy's marginal and q_transitions' matrix).
    Transition counts come from one lag window + one hash aggregate;
    determinism by the frozen-ln convention (each ln runs on an
    exactly-shared double, rounded to 6, fixed to DECIMAL, weighted by
    INTEGER c_st, summed exactly, divided by total once)."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.lag("event_type").over(w).alias("s"), F.col("event_type").alias("t")
        )
        .filter(F.col("s").isNotNull())
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    c_s = trans.groupBy("s").agg(F.sum("c_st").alias("c_s"))
    tot = trans.agg(F.sum("c_st").alias("total"))
    term = (
        F.col("c_st")
        * F.round(
            F.log(F.col("c_st").cast("double") / F.col("c_s").cast("double")), 6
        ).cast("decimal(18,6)")
    )
    return (
        trans.join(F.broadcast(c_s), "s")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum(term).cast("double") / F.max("total"), 6
            ).alias("entropy_rate_nats"),
            F.max("total").cast("bigint").alias("n_transitions"),
            F.count(F.lit(1)).cast("bigint").alias("n_state_pairs"),
        )
    )


_SQL_ENTROPY_RATE = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s,
         event_type AS t
  FROM events
), trans AS (
  SELECT s, t, COUNT(*) AS c_st FROM seq WHERE s IS NOT NULL GROUP BY 1, 2
), cs AS (
  SELECT s, SUM(c_st) AS c_s FROM trans GROUP BY 1
), tot AS (SELECT SUM(c_st) AS total FROM trans)
SELECT round(-CAST(SUM(c_st * CAST(round(ln(CAST(c_st AS DOUBLE) / CAST(c_s AS DOUBLE)), 6)
                                   AS DECIMAL(18,6))) AS DOUBLE)
             / MAX(total), 6) AS entropy_rate_nats,
       CAST(MAX(total) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_state_pairs
FROM trans JOIN cs USING (s), tot
"""


# ---------------------------------------------------------------------------
# cross-source vocabulary overlap (pairwise Jaccard)
# ---------------------------------------------------------------------------


def _q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard similarity between sources' vocabularies — the
    corpus-composition diagnostic (how much does one crawl share words
    with another?).  Scale shape: reduce to DISTINCT (source, token)
    FIRST (vocab grows far slower than the corpus), then the pair
    intersection is a token-key equi-join of that small frame with
    itself — never a doc-level cross join; union sizes come from the
    per-source vocab counts by inclusion-exclusion.  Exact integer
    counts; Jaccard is one division, rounded."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["source", "text"])
    vocab = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("nv_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("nv_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            (F.col("nv_a") + F.col("nv_b") - F.col("n_inter")).alias("n_union"),
            F.round(
                F.col("n_inter")
                / (F.col("nv_a") + F.col("nv_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


_SQL_VOCAB_OVERLAP = r"""
WITH vocab AS MATERIALIZED (
  SELECT DISTINCT source, u.tok
  FROM documents, unnest(string_split_regex(lower(trim(text)), '\s+')) AS u(tok)
  WHERE u.tok <> ''
), sizes AS (
  SELECT source, COUNT(*) AS nv FROM vocab GROUP BY 1
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter,
       sa.nv + sb.nv - n_inter AS n_union,
       round(n_inter / (sa.nv + sb.nv - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""


# ---------------------------------------------------------------------------
# top event paths (3-step path mining)
# ---------------------------------------------------------------------------

_TOP_PATHS_K = 10


def _q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step event paths across users (the clickstream
    path-mining staple, one step past q_transitions' 2-step matrix):
    two lag windows build (s1, s2, s3) triples per user, a hash
    aggregate counts them, top-10 by (count desc, path) — exact
    integers, deterministic ties.  One user_id shuffle + one tiny
    triple aggregate."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("s1"),
            F.lag("event_type", 1).over(w).alias("s2"),
            F.col("event_type").alias("s3"),
        )
        .filter(F.col("s1").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        triples.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("n"), "s1", "s2", "s3")),
        )
        .filter(F.col("rn") <= _TOP_PATHS_K)
        .select("rn", "s1", "s2", "s3", "n")
        .orderBy("rn")
    )


_SQL_TOP_PATHS = f"""
WITH seq AS (
  SELECT lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
         event_type AS s3
  FROM events
), triples AS (
  SELECT s1, s2, s3, COUNT(*) AS n FROM seq WHERE s1 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT rn, s1, s2, s3, n FROM (
  SELECT s1, s2, s3, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2, s3) AS rn
  FROM triples)
WHERE rn <= {_TOP_PATHS_K}
ORDER BY rn
"""


# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage weights
# ---------------------------------------------------------------------------


def _q_linkage_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter agreement weights (the probabilistic record
    linkage foundation, public 1969 method): over the blocked
    candidate name pairs (same noun token, distinct part names),
    estimate per-feature m = P(agree | match) and u = P(agree |
    non-match) with match proxied by edit distance <= 1, then the
    log-likelihood weights ln(m/u) and ln((1-m)/(1-u)).  Counts are
    add-1 smoothed exact integers from ONE aggregate over the
    candidate pairs; ratios are single divisions; ln is rounded to 6
    (frozen-ln convention).  Features: same token count, same first
    token, levenshtein <= 2.  Scale: the quadratic verify runs on the
    DISTINCT-name blocks only (the q_fuzzy_pairs argument).
    Reference capability evidence: join + aggregate surface,
    TestPhysicalOperatorsIIIStudents.java:231-299."""
    cat = Catalog(sf_dir)
    part = scan(spark, cat, "part", ["p_name"])
    names = part.select("p_name").distinct().select(
        "p_name", F.split(F.col("p_name"), " ").getItem(1).alias("__block")
    )
    a = names.select(F.col("p_name").alias("na"), "__block")
    b = names.select(F.col("p_name").alias("nb"), "__block")
    pairs = a.join(b, "__block").filter(F.col("na") < F.col("nb"))
    lev = F.levenshtein(F.col("na"), F.col("nb"))
    feats = pairs.select(
        (lev <= 1).cast("int").alias("is_match"),
        (F.size(F.split(F.col("na"), " ")) == F.size(F.split(F.col("nb"), " ")))
        .cast("int")
        .alias("f_ntok"),
        (
            F.split(F.col("na"), " ").getItem(0) == F.split(F.col("nb"), " ").getItem(0)
        ).cast("int").alias("f_first"),
        (lev <= 2).cast("int").alias("f_lev2"),
    )
    aggs = [
        F.sum("is_match").alias("n_m"),
        F.sum(1 - F.col("is_match")).alias("n_u"),
    ]
    for f in ("f_ntok", "f_first", "f_lev2"):
        aggs.append(F.sum(F.col("is_match") * F.col(f)).alias(f"a_m_{f}"))
        aggs.append(F.sum((1 - F.col("is_match")) * F.col(f)).alias(f"a_u_{f}"))
    wide = feats.agg(*aggs)
    entries = []
    for f in ("f_ntok", "f_first", "f_lev2"):
        m = (F.col(f"a_m_{f}") + 1).cast("double") / (F.col("n_m") + 2).cast("double")
        uu = (F.col(f"a_u_{f}") + 1).cast("double") / (F.col("n_u") + 2).cast("double")
        entries.append(
            F.struct(
                F.lit(f).alias("feature"),
                F.round(m, 6).alias("m_prob"),
                F.round(uu, 6).alias("u_prob"),
                F.round(F.log(m / uu), 6).alias("w_agree"),
                F.round(F.log((1 - m) / (1 - uu)), 6).alias("w_disagree"),
            )
        )
    return (
        wide.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.feature", "e.m_prob", "e.u_prob", "e.w_agree", "e.w_disagree")
        .orderBy("feature")
    )


def _sql_linkage_weights() -> str:
    selects = []
    for f in ("f_ntok", "f_first", "f_lev2"):
        selects.append(f"""SELECT '{f}' AS feature,
  round(CAST(a_m_{f} + 1 AS DOUBLE) / (n_m + 2), 6) AS m_prob,
  round(CAST(a_u_{f} + 1 AS DOUBLE) / (n_u + 2), 6) AS u_prob,
  round(ln((CAST(a_m_{f} + 1 AS DOUBLE) / (n_m + 2))
           / (CAST(a_u_{f} + 1 AS DOUBLE) / (n_u + 2))), 6) AS w_agree,
  round(ln((1 - CAST(a_m_{f} + 1 AS DOUBLE) / (n_m + 2))
           / (1 - CAST(a_u_{f} + 1 AS DOUBLE) / (n_u + 2))), 6) AS w_disagree
FROM wide""")
    body = "\nUNION ALL ".join(selects)
    return f"""
WITH names AS MATERIALIZED (
  SELECT DISTINCT p_name, string_split(p_name, ' ')[2] AS blk FROM part
), pairs AS (
  SELECT a.p_name AS na, b.p_name AS nb
  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
), feats AS (
  SELECT CASE WHEN levenshtein(na, nb) <= 1 THEN 1 ELSE 0 END AS is_match,
         CASE WHEN len(string_split(na, ' ')) = len(string_split(nb, ' '))
              THEN 1 ELSE 0 END AS f_ntok,
         CASE WHEN string_split(na, ' ')[1] = string_split(nb, ' ')[1]
              THEN 1 ELSE 0 END AS f_first,
         CASE WHEN levenshtein(na, nb) <= 2 THEN 1 ELSE 0 END AS f_lev2
  FROM pairs
), wide AS (
  SELECT SUM(is_match) AS n_m, SUM(1 - is_match) AS n_u,
         SUM(is_match * f_ntok) AS a_m_f_ntok, SUM((1 - is_match) * f_ntok) AS a_u_f_ntok,
         SUM(is_match * f_first) AS a_m_f_first, SUM((1 - is_match) * f_first) AS a_u_f_first,
         SUM(is_match * f_lev2) AS a_m_f_lev2, SUM((1 - is_match) * f_lev2) AS a_u_f_lev2
  FROM feats
)
SELECT * FROM ({body})
ORDER BY feature
"""


# ---------------------------------------------------------------------------
# point-in-time feature assembly (leakage-free as-of composition)
# ---------------------------------------------------------------------------


def _q_feature_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature assembly — the feature-store
    contract for training data: each label event (purchase) picks up,
    per feature table, the latest value STRICTLY BEFORE its timestamp
    (never at/after it — that is label leakage).  Two chained as-of
    joins (last click value, last view value per user), strictness
    implemented by probing at ts - 1 microsecond over the inclusive
    asof operator; feature tables are pre-reduced to one row per
    (user, ts) so tie-carry order cannot differ across engines.
    Output: per user-hash bucket, example counts, per-feature coverage
    and exact-decimal feature sums.  Scale: each as-of is ONE key
    shuffle + ordered sweep (operators/joins.py:asof_join), linear in
    labels+features — never a per-key range explosion.  Oracle:
    DuckDB's native ASOF JOIN with strict '<'."""
    from dbt_lab_spark.operators.joins import asof_join

    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("user_id", "ts", "event_type", "value")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.expr("timestampadd(MICROSECOND, -1, ts)").alias("probe_ts"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(money("value")).alias("f_click"))
        .withColumnRenamed("ts", "c_ts")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max(money("value")).alias("f_view"))
        .withColumnRenamed("ts", "v_ts")
    )
    with_click = asof_join(
        labels, clicks, key="user_id", left_ts="probe_ts", right_ts="c_ts"
    )
    with_both = asof_join(
        with_click, views, key="user_id", left_ts="probe_ts", right_ts="v_ts"
    )
    return (
        with_both.groupBy((F.col("user_id") % 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.count("f_click").alias("n_click_feat"),
            F.count("f_view").alias("n_view_feat"),
            F.round(F.sum("f_click").cast("double"), 2).alias("sum_click_feat"),
            F.round(F.sum("f_view").cast("double"), 2).alias("sum_view_feat"),
        )
        .orderBy("bucket")
    )


_SQL_FEATURE_PIT = """
WITH labels AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts AS c_ts, MAX(CAST(value AS DECIMAL(18,2))) AS f_click
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), views AS (
  SELECT user_id, ts AS v_ts, MAX(CAST(value AS DECIMAL(18,2))) AS f_view
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), with_click AS (
  SELECT l.user_id, l.ts, c.f_click
  FROM labels l ASOF LEFT JOIN clicks c
    ON l.user_id = c.user_id AND l.ts > c.c_ts
), with_both AS (
  SELECT w.user_id, w.ts, w.f_click, v.f_view
  FROM with_click w ASOF LEFT JOIN views v
    ON w.user_id = v.user_id AND w.ts > v.v_ts
)
SELECT user_id % 16 AS bucket,
       COUNT(*) AS n_examples,
       COUNT(f_click) AS n_click_feat,
       COUNT(f_view) AS n_view_feat,
       round(CAST(SUM(f_click) AS DOUBLE), 2) AS sum_click_feat,
       round(CAST(SUM(f_view) AS DOUBLE), 2) AS sum_view_feat
FROM with_both
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# one-pass k-fold cross-validated OLS (moment subtraction)
# ---------------------------------------------------------------------------

_CV_FOLDS = 5
_CV_SALT = "cvfold"


def _q_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated simple OLS (order total ~ line count) in
    ONE data pass: rows get md5-deterministic folds, a single hash
    aggregate collects per-fold exact-decimal moments, and each fold's
    TRAINING moments are total-minus-fold subtraction — so train/eval
    for all k folds costs one scan, never k re-scans (the set-based CV
    trick that matters when the table is 100 TB).  Held-out SSE
    expands algebraically from the same fold moments (SSE = Syy
    - 2a*Sy - 2b*Sxy + a^2*n + 2ab*Sx + b^2*Sxx), so no second pass
    scores predictions either.  Exact integer/decimal moments; the
    solve and RMSE are fixed double expressions rounded to 6."""
    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"])
    li = scan(spark, cat, "lineitem", ["l_orderkey"])
    per = orders.join(
        li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
            F.count(F.lit(1)).alias("x")
        ),
        "o_orderkey",
    ).select(
        "o_orderkey",
        "x",
        money("o_totalprice").alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(_CV_SALT))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _CV_FOLDS
        ).alias("fold"),
    )
    fm = per.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    tot = fm.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    j = fm.crossJoin(F.broadcast(tot))
    trn = (F.col("tn") - F.col("n")).cast("double")
    trsx = (F.col("tsx") - F.col("sx")).cast("double")
    trsy = (F.col("tsy") - F.col("sy")).cast("double")
    trsxx = (F.col("tsxx") - F.col("sxx")).cast("double")
    trsxy = (F.col("tsxy") - F.col("sxy")).cast("double")
    b = (trn * trsxy - trsx * trsy) / (trn * trsxx - trsx * trsx)
    a = (trsy - b * trsx) / trn
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy, syy = (
        F.col("sxx").cast("double"),
        F.col("sxy").cast("double"),
        F.col("syy").cast("double"),
    )
    sse = syy - 2 * a * sy - 2 * b * sxy + a * a * n + 2 * a * b * sx + b * b * sxx
    return j.select(
        F.col("fold").cast("int").alias("fold"),
        F.col("n").cast("bigint").alias("n_test"),
        F.round(b, 6).alias("slope"),
        F.round(a, 6).alias("intercept"),
        F.round(F.sqrt(sse / n), 6).alias("rmse"),
    ).orderBy("fold")


def _sql_cv_ols() -> str:
    return f"""
WITH per AS (
  SELECT o.o_orderkey, l.x, CAST(o.o_totalprice AS DECIMAL(18,2)) AS y,
         CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '{_CV_SALT}'), 1, 15))
              AS BIGINT) % {_CV_FOLDS} AS fold
  FROM orders o JOIN (
    SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY 1
  ) l ON l.l_orderkey = o.o_orderkey
), fm AS (
  SELECT fold, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM per GROUP BY 1
), tot AS (
  SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
         SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
  FROM fm
), solved AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy,
         (CAST(tn - n AS DOUBLE) * CAST(tsxy - sxy AS DOUBLE)
          - CAST(tsx - sx AS DOUBLE) * CAST(tsy - sy AS DOUBLE))
         / (CAST(tn - n AS DOUBLE) * CAST(tsxx - sxx AS DOUBLE)
            - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)) AS b,
         tn, tsx, tsy
  FROM fm, tot
), ab AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy, b,
         (CAST(tsy - sy AS DOUBLE) - b * CAST(tsx - sx AS DOUBLE))
         / CAST(tn - n AS DOUBLE) AS a
  FROM solved
)
SELECT CAST(fold AS INTEGER) AS fold, CAST(n AS BIGINT) AS n_test,
       round(b, 6) AS slope, round(a, 6) AS intercept,
       round(sqrt((CAST(syy AS DOUBLE) - 2 * a * CAST(sy AS DOUBLE)
                   - 2 * b * CAST(sxy AS DOUBLE) + a * a * CAST(n AS DOUBLE)
                   + 2 * a * b * CAST(sx AS DOUBLE) + b * b * CAST(sxx AS DOUBLE))
                  / CAST(n AS DOUBLE)), 6) AS rmse
FROM ab
ORDER BY fold
"""


# ---------------------------------------------------------------------------
# exact two-sample Kolmogorov-Smirnov (integer-rational D)
# ---------------------------------------------------------------------------


def _q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between 'view' and
    'purchase' event-value distributions — the nonparametric drift
    test next to q_psi's binned score.  ENTIRELY integer-rational:
    reduce to per-distinct-value counts first (the domain compresses
    under DECIMAL(18,2) canonicalization), one cumulative window over
    the ordered distinct values, and D's numerator is
    max |c1*n2 - c2*n1| — an exact integer max, divided once at the
    end.  No floating comparisons anywhere until the final division,
    so both engines agree bit-for-bit.  Output: (d_stat, d_num, n1,
    n2, crossings)."""
    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("event_type", money("value").alias("v"))
    per_v = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
        )
    )
    tot = per_v.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "v",
        F.sum("a").over(w).alias("c1"),
        F.sum("b").over(w).alias("c2"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias("g"),
        "n1",
        "n2",
    )
    return gap.agg(
        F.round(
            F.max("g").cast("double") / (F.max("n1") * F.max("n2")).cast("double"), 6
        ).alias("d_stat"),
        F.max("g").cast("bigint").alias("d_num"),
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_values"),
    )


_SQL_KS_TEST = """
WITH per_v AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
), tot AS (
  SELECT SUM(a) AS n1, SUM(b) AS n2 FROM per_v
), cum AS (
  SELECT v,
         SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2
  FROM per_v
), gap AS (
  SELECT abs(c1 * n2 - c2 * n1) AS g, n1, n2 FROM cum, tot
)
SELECT round(CAST(MAX(g) AS DOUBLE) / CAST(MAX(n1) * MAX(n2) AS DOUBLE), 6) AS d_stat,
       CAST(MAX(g) AS BIGINT) AS d_num,
       CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(MAX(n2) AS BIGINT) AS n2,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_values
FROM gap
"""


EXTRA_QUERIES: list[QueryDef] = [
    QueryDef("q_bfs_hops", _q_bfs_hops, _SQL_BFS_HOPS, "single-source BFS vs recursive CTE"),
    QueryDef("q_triangles", _q_triangles, _SQL_TRIANGLES, "oriented-wedge triangle counts"),
    QueryDef("q_merge_upsert", _q_merge_upsert, _SQL_MERGE_UPSERT, "MERGE upsert audit"),
    QueryDef("q_cooccur_pmi", _q_cooccur_pmi, _SQL_COOCCUR_PMI, "token co-occurrence PMI top-20"),
    QueryDef("q_mad_outliers", _q_mad_outliers, _SQL_MAD_OUTLIERS, "median/MAD robust outliers"),
    QueryDef(
        "q_bloom_decontaminate",
        _q_bloom_decontaminate,
        _sql_bloom_decontaminate(),
        "Bloom-prefiltered 8-gram decontamination",
    ),
    QueryDef("q_dataset_diff", _q_dataset_diff, _SQL_DATASET_DIFF, "snapshot diff audit"),
    QueryDef("q_avro_ingest", _q_avro_ingest, _SQL_AVRO_INGEST, "Avro OCF shard round-trip"),
    QueryDef("q_interp_fill", _q_interp_fill, _SQL_INTERP_FILL, "linear interpolation resample"),
    QueryDef("q_hll_sketch", _q_hll_sketch, _sql_hll_sketch(), "oracle-checkable HLL sketch"),
    QueryDef("q_skyline", _q_skyline, _SQL_SKYLINE, "Pareto frontier (sweep vs NOT EXISTS)"),
    QueryDef("q_expectations", _q_expectations, _SQL_EXPECTATIONS, "data-quality expectations gate"),
    QueryDef("q_entity_cc", _q_entity_cc, _SQL_ENTITY_CC, "fuzzy-match entity clusters (CC oracle)"),
    QueryDef("q_scd2", _q_scd2, _SQL_SCD2, "SCD type-2 history build audit"),
    QueryDef(
        "q_weighted_sample", _q_weighted_sample, _sql_weighted_sample(),
        "Efraimidis-Spirakis weighted sample (no-RNG)",
    ),
    QueryDef(
        "q_corr_matrix", _q_corr_matrix, _sql_corr_matrix(),
        "deterministic correlation matrix (exact moments)",
    ),
    QueryDef("q_ols", _q_ols, _SQL_OLS, "per-group OLS via exact decimal moments"),
    QueryDef("q_kmv_union", _q_kmv_union, _sql_kmv_union(), "KMV sketches + sketch-union estimate"),
    QueryDef(
        "q_table_checksum", _q_table_checksum, _SQL_TABLE_CHECKSUM,
        "order-independent partition checksums",
    ),
    QueryDef(
        "q_ngram_jaccard_pp", _q_ngram_jaccard_pp, _sql_ngram_jaccard_pp(),
        "PPJoin prefix-filtered exact jaccard",
    ),
    QueryDef("q_acf", _q_acf, _sql_acf(), "hourly-series autocorrelation (exact moments)"),
    QueryDef("q_rrf", _q_rrf, _sql_rrf(), "reciprocal-rank fusion hybrid retrieval"),
    QueryDef("q_time_travel", _q_time_travel, _SQL_TIME_TRAVEL, "snapshot-log time travel audit"),
    QueryDef("q_benford", _q_benford, _SQL_BENFORD, "Benford first-digit audit"),
    QueryDef("q_gini", _q_gini, _SQL_GINI, "Gini concentration (exact rank formula)"),
    QueryDef("q_pdf_extract", _q_pdf_extract, _SQL_PDF_EXTRACT, "PDF typeset+extract round-trip"),
    QueryDef(
        "q_html_extract", _q_html_extract, _SQL_HTML_EXTRACT,
        "HTML boilerplate-removal round-trip",
    ),
    QueryDef(
        "q_docx_extract", _q_docx_extract, _SQL_DOCX_EXTRACT,
        "DOCX package+extract round-trip",
    ),
    QueryDef(
        "q_ipynb_extract", _q_ipynb_extract, _SQL_IPYNB_EXTRACT,
        "notebook-JSON round trip (pure JVM)",
    ),
    QueryDef("q_pr_curve", _q_pr_curve, _sql_pr_curve(), "precision/recall/F1 operating points"),
    QueryDef("q_theil_sen", _q_theil_sen, _SQL_THEIL_SEN, "Theil-Sen robust trend (exact medians)"),
    QueryDef("q_ridge", _q_ridge, _sql_ridge(), "closed-form 2-feature ridge regression"),
    QueryDef(
        "q_bootstrap_ci", _q_bootstrap_ci, _sql_bootstrap_ci(),
        "deterministic Poisson-bootstrap mean CI",
    ),
    QueryDef("q_zorder", _q_zorder, _sql_zorder(), "Z-order multi-dim clustering audit"),
    QueryDef(
        "q_dsir_sample", _q_dsir_sample, _sql_dsir_sample(),
        "DSIR importance resampling (hashed-ngram LLR)",
    ),
    QueryDef(
        "q_assortativity", _q_assortativity, _SQL_ASSORTATIVITY,
        "degree assortativity (exact moments)",
    ),
    QueryDef(
        "q_label_prop", _q_label_prop, _sql_label_prop(),
        "label-propagation communities (unrolled oracle)",
    ),
    QueryDef(
        "q_approx_quantiles", _q_approx_quantiles, _sql_approx_quantiles(),
        "mergeable approx quantiles (tolerance-band oracle)",
    ),
    QueryDef("q_psi", _q_psi, _sql_psi(), "PSI drift per source (frozen-ln decimal)"),
    QueryDef(
        "q_hll_window", _q_hll_window, _sql_hll_window(),
        "7-day sliding HLL merge (sketch rollup oracle)",
    ),
    QueryDef(
        "q_salted_join", _q_salted_join, _SQL_SALTED_JOIN,
        "skew-salted join (result-invisible oracle)",
    ),
    QueryDef(
        "q_geo_nearest", _q_geo_nearest, _sql_geo_nearest(),
        "grid-binned haversine nearest neighbor",
    ),
    QueryDef("q_burstiness", _q_burstiness, _SQL_BURSTINESS, "inter-arrival burstiness histogram"),
    QueryDef(
        "q_entropy_rate", _q_entropy_rate, _SQL_ENTROPY_RATE,
        "Markov entropy rate (frozen-ln decimal)",
    ),
    QueryDef(
        "q_vocab_overlap", _q_vocab_overlap, _SQL_VOCAB_OVERLAP,
        "pairwise source vocabulary Jaccard",
    ),
    QueryDef("q_top_paths", _q_top_paths, _SQL_TOP_PATHS, "top-10 3-step event paths"),
    QueryDef(
        "q_linkage_weights", _q_linkage_weights, _sql_linkage_weights(),
        "Fellegi-Sunter linkage weights (frozen-ln)",
    ),
    QueryDef(
        "q_feature_pit", _q_feature_pit, _SQL_FEATURE_PIT,
        "leakage-free point-in-time feature assembly",
    ),
    QueryDef(
        "q_cv_ols", _q_cv_ols, _sql_cv_ols(),
        "one-pass 5-fold CV OLS (moment subtraction)",
    ),
    QueryDef("q_ks_test", _q_ks_test, _SQL_KS_TEST, "exact integer-rational 2-sample KS"),
]
