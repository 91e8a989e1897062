"""Beyond-reference workload: events (windowed/sessionized), documents
(text analysis + dedup), embeddings (similarity search).  Same
(builder, oracle) contract as dbt_lab_spark.workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.functions.text import fingerprint, token_count
from dbt_lab_spark.llm.dedup import minhash_dedup_pairs, simhash_dedup_pairs
from dbt_lab_spark.llm.similarity import brute_force_knn, lsh_knn
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef

# ---------------------------------------------------------------------------
# events: tumbling window + sessionization (SURVEY.md §2.9 gap filled)
# ---------------------------------------------------------------------------


def _q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate over the events table — the
    batch expression of the streaming windowed aggregate (the same
    groupBy(window(...)) works under readStream; see
    dbt_lab_spark.streaming)."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["ts", "event_type", "value"])
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(money("value")).cast("double").alias("sum_value"),
    )


_SQL_TUMBLING_WINDOW = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag + cumulative
    session counter per user (the batch idiom; streaming uses
    session_window).  Gap compared in exact epoch-millis."""
    cat = Catalog(sf_dir)
    ev = scan(spark, cat, "events", ["user_id", "event_id", "ts", "value"])
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(order))
    with_flag = ev.withColumn(
        "__new_session",
        F.when(gap_ms.isNull() | (gap_ms > 30 * 60 * 1000), F.lit(1)).otherwise(F.lit(0)),
    )
    with_id = with_flag.withColumn(
        "session_seq",
        F.sum("__new_session").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_id.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(money("value")).cast("double").alias("sum_value"),
    )


_SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 30*60*1000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM numbered GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# documents: text analysis + dedup
# ---------------------------------------------------------------------------


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source text statistics: token counting + char stats — the
    cheap pre-filter metrics of a data pipeline, all JVM-side."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "source"])
    per_doc = docs.select(
        "source",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("n_chars_calc").alias("sum_chars"),
        F.max("n_tokens").alias("max_tokens"),
    )


_SQL_TEXT_STATS = """
WITH per_doc AS (
  SELECT source,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER) AS n_tokens,
         length(text) AS n_chars_calc
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_chars_calc) AS BIGINT) AS sum_chars,
       MAX(n_tokens) AS max_tokens
FROM per_doc GROUP BY source
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup group summary: md5 fingerprint -> representative id +
    copy count (hash-groupBy dedup; oracle-identical md5 on both sides)."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text"])
    return (
        docs.select(fingerprint("text").alias("fp"), F.col("doc_id"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("doc_id").alias("n_copies"))
    )


_SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(doc_id) AS n_copies
FROM documents GROUP BY md5(text)
"""


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (est_jaccard >= 0.5).
    Non-SQL-expressible (seeded xxhash banding) -> rows-only check;
    exactness is pin-tested against true Jaccard in tests/."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text"])
    return minhash_dedup_pairs(docs, num_hashes=64, shingle_k=3, num_bands=16, threshold=0.5)


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 6) — rows-only check."""
    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "text"])
    return simhash_dedup_pairs(docs, max_hamming=6)


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------


def _q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for 5 query vectors over the corpus.
    Oracle mirrors the expression dot/(|a|*|b|) with list_dot_product."""
    cat = Catalog(sf_dir)
    emb = scan(spark, cat, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    return brute_force_knn(corpus, queries, k=10)


_SQL_KNN_BRUTEFORCE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id >= 5
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM c, q
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate KNN — rows-only check (recall vs exact
    KNN is pin-tested in tests/)."""
    cat = Catalog(sf_dir)
    emb = scan(spark, cat, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    return lsh_knn(corpus, queries, k=10, num_planes=6, num_tables=6)


BEYOND_QUERIES: list[QueryDef] = [
    QueryDef("q_tumbling_window", _q_tumbling_window, _SQL_TUMBLING_WINDOW, "1h tumbling agg"),
    QueryDef("q_sessionize", _q_sessionize, _SQL_SESSIONIZE, "30-min-gap sessions"),
    QueryDef("q_text_stats", _q_text_stats, _SQL_TEXT_STATS, "token/char stats"),
    QueryDef("q_dedup_exact", _q_dedup_exact, _SQL_DEDUP_EXACT, "exact dedup groups"),
    QueryDef("q_minhash_pairs", _q_minhash_pairs, None, "minhash LSH near-dup"),
    QueryDef("q_simhash_pairs", _q_simhash_pairs, None, "simhash near-dup"),
    QueryDef("q_knn_bruteforce", _q_knn_bruteforce, _SQL_KNN_BRUTEFORCE, "exact cosine top-k"),
    QueryDef("q_knn_lsh", _q_knn_lsh, None, "LSH approximate top-k"),
]
