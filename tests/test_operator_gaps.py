"""Coverage for exported operators not exercised elsewhere:
index_scan, except_all (bag semantics), delete_where, windowed_agg,
exact_dup_groups — planted-data pins with independent expectations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators import except_all, index_scan, windowed_agg
from dbt_lab_spark.operators.dml import delete_where


def test_index_scan_range_and_order(spark, sf_medium):
    """IndexScan == pruned scan in key order: inclusive/exclusive bounds
    and the one-sided degenerate case, rows back in key order."""
    cat = Catalog(sf_medium)
    full = sorted(
        r["o_orderkey"]
        for r in cat.table(spark, "orders").select("o_orderkey").collect()
    )
    got = [
        r["o_orderkey"]
        for r in index_scan(
            spark, cat, "orders", "o_orderkey", 100, 500,
            start_inclusive=True, stop_inclusive=False,
        ).select("o_orderkey").collect()
    ]
    assert got == [k for k in full if 100 <= k < 500]
    one_sided = [
        r["o_orderkey"]
        for r in index_scan(spark, cat, "orders", "o_orderkey", start_key=full[-1])
        .select("o_orderkey")
        .collect()
    ]
    assert one_sided == [full[-1]]


def test_except_all_bag_semantics(spark):
    """EXCEPT ALL keeps multiplicities (2 copies minus 1 copy = 1 left),
    unlike EXCEPT DISTINCT."""
    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["v"])
    right = spark.createDataFrame([(1,), (3,), (4,)], ["v"])
    got = sorted(r["v"] for r in except_all(left, right).collect())
    assert got == [1, 2]


def test_delete_where_rewrites_table(spark, sf_medium, tmp_path):
    cat = Catalog(sf_medium)
    src = str(tmp_path / "t")
    cat.table(spark, "region").write.parquet(src)
    delete_where(spark, src, F.col("r_name") == "ASIA")
    names = sorted(r["r_name"] for r in spark.read.parquet(src).collect())
    assert "ASIA" not in names and len(names) == 4


def test_windowed_agg_matches_sql_over(spark, sf_medium):
    cat = Catalog(sf_medium)
    orders = cat.table(spark, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    got = windowed_agg(
        orders, ["o_custkey"], ["o_orderkey"], F.max("o_totalprice"), "mx"
    )
    # running max must be >= the row's own price and non-decreasing per cust
    rows = got.orderBy("o_custkey", "o_orderkey").collect()
    prev = {}
    for r in rows:
        assert r["mx"] >= r["o_totalprice"]
        if r["o_custkey"] in prev:
            assert r["mx"] >= prev[r["o_custkey"]]
        prev[r["o_custkey"]] = r["mx"]


def test_exact_dup_groups_counts(spark):
    from dbt_lab_spark.llm.dedup import exact_dup_groups

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "aaa"), (5, "ccc")],
        ["doc_id", "text"],
    )
    got = {r["keep_id"]: r["n_copies"] for r in exact_dup_groups(df).collect()}
    assert got == {1: 3, 3: 1, 5: 1}


def test_winnow_guarantees_shared_fingerprint_on_overlap(spark):
    """Winnowing's detection guarantee: two documents sharing a run of
    at least w + k - 1 tokens share at least one selected fingerprint;
    and the selection is much denser than 1 but sparser than every
    window (~2/(w+1) density)."""
    from dbt_lab_spark.functions.text import rolling_hashes, winnow

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = w+k-1
    docs = [
        (1, "one two three " + shared + " four five six"),
        (2, "seven eight " + shared + " nine ten eleven twelve"),
        (3, "totally different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rh = df.select("doc_id", rolling_hashes("text", k=4).alias("rhs"))
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in rh.select("doc_id", winnow(F.col("rhs"), w=5).alias("fps")).collect()
    }
    assert fps[1] & fps[2], "overlapping docs must share a fingerprint"
    assert not (fps[1] & fps[3])
    n_windows = {r["doc_id"]: len(r["rhs"]) for r in rh.collect()}
    for d in (1, 2, 3):
        assert 1 <= len(fps[d]) < n_windows[d]


def test_quantization_error_bounded_by_half_scale(spark, sf_medium):
    """int8 min/max quantization error is at most scale/2 = (mx-mn)/510
    per component — the bound that makes 4x compression safe."""
    from dbt_lab_spark.functions.vectors import quantization_error_int8, to_double_array

    emb = spark.read.parquet(f"{sf_medium}/embeddings.parquet").limit(500)
    v = to_double_array("embedding")
    checked = emb.select(
        F.array_max(quantization_error_int8(v)).alias("worst"),
        ((F.array_max(v) - F.array_min(v)) / 510.0 + 1e-12).alias("bound"),
    )
    assert checked.filter(F.col("worst") > F.col("bound")).count() == 0


def test_python_udtf_chunker_matches_native(spark, sf_small):
    """Python UDTF = the 'bring your own table function' extension
    surface (the reference's custom-HadoopOperator analogue,
    SURVEY.md §2.10).  A UDTF chunker must emit exactly the rows of
    the native explode+slice chunker — same windows, same truncation.
    The UDTF is the flexibility path; the native form is the fast
    path (JVM-side, no Python crossing)."""
    from pyspark.sql.functions import udtf

    size, stride = 32, 16

    @udtf(returnType="chunk_idx int, chunk string")
    class Chunker:
        def eval(self, text: str):
            toks = text.lower().strip().split()
            i = idx = 0
            while True:
                yield idx, " ".join(toks[i : i + size])
                if i + size >= len(toks):
                    break
                i += stride
                idx += 1

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    via_udtf = {
        (r["doc_id"], r["chunk_idx"]): r["chunk"]
        for r in docs.lateralJoin(Chunker(F.col("text").outer()))
        .select("doc_id", "chunk_idx", "chunk")
        .collect()
    }

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil((n - size) / F.lit(stride)) + 1, F.lit(1)).cast("int")
    t = docs.select(
        "doc_id", toks.alias("t"), F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
    )
    native = {
        (r["doc_id"], r["pos"]): r["chunk"]
        for r in t.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.slice(F.col("t"), F.col("pos") * stride + 1, size)).alias(
                "chunk"
            ),
        ).collect()
    }
    assert via_udtf == native


def test_ntile_approx_buckets_without_global_sort(spark, sf_medium):
    """ntile_approx: value-monotone buckets sized ~n/k from a sketch +
    broadcast — and crucially NO Window / no global sort of the data
    in the plan (that single-total-order is exactly what exact NTILE
    can't avoid at 100 TB)."""
    from dbt_lab_spark.operators.window import ntile_approx

    cat = Catalog(sf_medium)
    li = cat.table(spark, "lineitem").select("l_extendedprice")
    k = 10
    bucketed = ntile_approx(li, "l_extendedprice", k=k, accuracy=10_000)

    plan = bucketed._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Window" not in plan, plan

    stats = (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("bucket")
        .collect()
    )
    assert [r["bucket"] for r in stats] == list(range(1, k + 1))
    n_total = sum(r["n"] for r in stats)
    for r in stats:
        assert abs(r["n"] - n_total / k) <= 0.2 * n_total / k, stats
    for prev, nxt in zip(stats, stats[1:]):
        assert prev["hi"] <= nxt["lo"], stats
