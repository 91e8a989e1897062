"""Pin tests for llm/curation.py: planted-data checks that don't
depend on the shared tables (the registry parity tests in
test_oracle_parity.py cover the cross-engine gate)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.llm.curation import (
    decontamination_pairs,
    max_multiplicity,
    mix_epochs,
    pack_sequences,
    pii_counts,
    redact_pii,
)


def test_redact_pii_planted_strings(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith+x@mail.example.org today"),
            (2, "call +1-555-0042 or +1-555-9999 now"),
            (3, "no pii here at all"),
            (4, "both bob@x.io and +1-555-0000"),
        ],
        "id int, text string",
    )
    counts = pii_counts("text")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii("text").alias("red"),
            counts["n_emails"].alias("ne"),
            counts["n_phones"].alias("np"),
        ).collect()
    }
    assert rows[1]["red"] == "write to <EMAIL> today"
    assert (rows[1]["ne"], rows[1]["np"]) == (1, 0)
    assert rows[2]["red"] == "call <PHONE> or <PHONE> now"
    assert (rows[2]["ne"], rows[2]["np"]) == (0, 2)
    assert rows[3]["red"] == "no pii here at all"
    assert rows[4]["red"] == "both <EMAIL> and <PHONE>"
    assert (rows[4]["ne"], rows[4]["np"]) == (1, 1)


def test_max_multiplicity_counts_most_frequent(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "c", "a"]),
            (2, ["x"]),
            (3, []),
            (4, ["t", "t", "t", "t"]),
        ],
        "id int, arr array<string>",
    )
    got = {r["id"]: r["m"] for r in df.select("id", max_multiplicity(F.col("arr")).alias("m")).collect()}
    assert got == {1: 3, 2: 1, 3: 0, 4: 4}


def _hex_prefix(key: str, salt: str) -> str:
    return hashlib.md5((key + salt).encode()).hexdigest()[:15]


def test_mix_epochs_matches_python_recomputation(spark):
    epochs = {"a": 2.5, "b": 1.0, "c": 0.4}  # 'd' unlisted -> dropped
    df = spark.createDataFrame(
        [(i, "abcd"[i % 4]) for i in range(200)], "doc_id long, src string"
    )
    out = mix_epochs(df, "doc_id", "src", epochs).groupBy("doc_id", "src").count().collect()
    got = {(r["doc_id"], r["src"]): r["count"] for r in out}

    space = 16**15
    expected = {}
    for i in range(200):
        s = "abcd"[i % 4]
        e = epochs.get(s, 0.0)
        n = int(math.floor(e))
        frac = e - math.floor(e)
        if frac > 0 and _hex_prefix(str(i), "mix") < format(int(frac * space), "015x"):
            n += 1
        if n >= 1:
            expected[(i, s)] = n
    assert got == expected
    # fractional arm actually fires both ways at this size
    a_counts = {k: v for k, v in expected.items() if k[1] == "a"}
    assert {2, 3} == set(a_counts.values())


def test_pack_sequences_prefix_sum_assignment(spark):
    df = spark.createDataFrame(
        [(1, "x", 60), (2, "x", 50), (3, "x", 10), (4, "x", 100), (5, "y", 250)],
        "doc_id long, part string, tok int",
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, "part", "doc_id", "tok", budget=100).collect()
    }
    # cumulative-before: 0, 60, 110, 120 -> packs 0, 0, 1, 1; y starts at 0
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_source_cap_matches_python_hash_order(spark):
    from dbt_lab_spark.llm.sampling import hash_bucket

    df = spark.createDataFrame([(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("hb", "doc_id")
    kept = (
        df.withColumn("hb", hash_bucket("doc_id", "cap"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}

    expected = set()
    for s in ("s0", "s1", "s2"):
        ids = [i for i in range(90) if f"s{i % 3}" == s]
        ranked = sorted(ids, key=lambda i: (_hex_prefix(str(i), "cap"), i))
        expected |= {(s, i) for i in ranked[:5]}
    assert got == expected


def test_quality_filter_drops_about_a_quartile(spark):
    import __spark_entry__ as entry

    df = entry.queries()["q_quality_filter"](spark, "/root/testdata/sf0.01")
    total_kept = sum(r["n_kept"] for r in df.collect())
    from dbt_lab_spark.catalog import Catalog

    n = Catalog("/root/testdata/sf0.01").table(spark, "documents").count()
    assert 0.70 * n <= total_kept <= 0.80 * n


def test_max_multiplicity_matches_counter_on_random_arrays(spark):
    import collections
    import random

    rng = random.Random(20260813)
    rows = []
    for i in range(300):
        arr = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 3)))
               for _ in range(rng.randint(0, 30))]
        rows.append((i, arr))
    df = spark.createDataFrame(rows, "id int, arr array<string>")
    got = {
        r["id"]: r["m"]
        for r in df.select("id", max_multiplicity(F.col("arr")).alias("m")).collect()
    }
    for i, arr in rows:
        expected = max(collections.Counter(arr).values()) if arr else 0
        assert got[i] == expected, (i, arr)


def test_redact_pii_is_idempotent_on_random_text(spark):
    import random

    rng = random.Random(42)
    words = ["alpha", "beta", "x@y.io", "+1-555-0000", "a.b%c@d-e.org", "gamma"]
    rows = [(i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id int, text string")
    twice = df.select(
        "id",
        redact_pii("text").alias("once"),
        redact_pii(redact_pii("text")).alias("twice"),
    )
    assert twice.filter(F.col("once") != F.col("twice")).count() == 0


def test_pack_sequences_matches_python_prefix_sum_on_random_input(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice(["p", "q"]), rng.randint(0, 400)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, part string, tok int")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, "part", "doc_id", "tok", budget=512).collect()
    }
    for part in ("p", "q"):
        cum = 0
        for i, p, tok in rows:  # rows are already in doc_id order
            if p != part:
                continue
            assert got[i] == cum // 512, (i, cum)
            cum += tok


def test_decontamination_detects_planted_overlap(spark):
    shared = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [
            (1, f"prefix junk {shared} suffix junk words"),
            (2, "totally different content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"{shared} trailing eval tokens"), (101, "unrelated eval doc text entirely")],
        "doc_id long, text string",
    )
    pairs = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in decontamination_pairs(train, ev, k=8).collect()
    }
    assert (1, 100) in pairs and pairs[(1, 100)] >= 1
    assert all(t == 1 and e == 100 for t, e in pairs)


def test_streaming_pii_redaction_matches_batch(spark, tmp_path):
    """Redaction is a stateless narrow projection, so the identical
    Column expression runs unchanged under Structured Streaming —
    streamed output rows must equal the batch transform exactly."""
    from dbt_lab_spark.catalog import Catalog

    sf = "/root/testdata/sf0.001"
    cat = Catalog(sf)
    batch_docs = cat.table(spark, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" mail u"), F.col("doc_id").cast("string"), F.lit("@ex.org")),
        ).otherwise(F.lit("")),
    )

    def transform(df):
        return df.select("doc_id", redact_pii(planted).alias("red"))

    stream = (
        spark.readStream.schema(batch_docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["doc_id"], r["red"]) for r in spark.sql("SELECT * FROM pii_stream").collect()}
    want = {(r["doc_id"], r["red"]) for r in transform(batch_docs).collect()}
    assert got == want and len(got) > 0
    assert any("<EMAIL>" in red for _, red in got)


def test_trigram_lm_score_hand_computed(spark):
    """Two docs of 'a b c' and one 'a b d': for doc0's trigram 'a b c',
    c(abc)=2, c(ab)=3, c(bc)=2, c(b)=3, c(c)=2, N=9, V=4 ->
    P = .5*(2/3) + .3*(2/3) + .2*(3/13); higher-count trigram scores
    above the singleton 'a b d'."""
    import math as m

    from dbt_lab_spark.llm.curation import trigram_lm_score

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in trigram_lm_score(docs).collect()}
    expect0 = round(m.log(0.5 * (2 / 3) + 0.3 * (2 / 3) + 0.2 * (3 / 13)), 4)
    expect2 = round(m.log(0.5 * (1 / 3) + 0.3 * (1 / 3) + 0.2 * (2 / 13)), 4)
    assert rows[0]["trigram_lm_score"] == expect0
    assert rows[1]["trigram_lm_score"] == expect0
    assert rows[2]["trigram_lm_score"] == expect2
    assert rows[0]["trigram_lm_score"] > rows[2]["trigram_lm_score"]
    assert all(r["n_trigrams"] == 1 for r in rows.values())


def test_normalize_text_unicode_pins(spark):
    """Planted mojibake-adjacent inputs: NFC composition, control
    strip, whitespace collapse, explicit-set trim — each pinned."""
    import unicodedata

    from dbt_lab_spark.llm.curation import normalize_text

    decomposed = "Café"  # e + combining acute
    rows = [
        (1, decomposed),
        (2, "a\x00b\x07c"),               # control chars vanish
        (3, "x \t  y\t\tz"),               # runs collapse to one space
        (4, "  padded  \t\n"),             # explicit-set trim
        (5, "keep\nnewlines\nintact"),     # \n survives (not in the run class)
        (6, None),                          # null passes through
        (7, " nbsp edges "),     # unicode spaces NOT trimmed (SQL parity)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_norm"] for r in normalize_text(docs).collect()}
    assert got[1] == unicodedata.normalize("NFC", decomposed) == "Café"
    assert got[2] == "abc"
    assert got[3] == "x y z"
    assert got[4] == "padded"
    assert got[5] == "keep\nnewlines\nintact"
    assert got[6] is None
    assert got[7] == " nbsp edges "


def test_normalize_text_matches_duckdb_stage(spark):
    """The Arrow stage and the oracle SQL produce identical strings on
    unicode-bearing input (the corpus itself is too clean to prove it)."""
    import duckdb

    from dbt_lab_spark.llm.curation import normalize_text

    rows = [
        (1, "Café  con   leche"),
        (2, "tab\tseparated\x01ctrl"),
        (3, " Ångström units "),
        (4, "plain ascii"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_norm"] for r in normalize_text(docs).collect()}
    con = duckdb.connect()
    for doc_id, text in rows:
        want = con.execute(
            r"""SELECT trim(regexp_replace(regexp_replace(nfc_normalize(?),
                 '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'), '[ \t]+', ' ', 'g'),
                 ' ' || chr(9) || chr(10))""",
            [text],
        ).fetchone()[0]
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_compression_ratio_separates_boilerplate(spark):
    import zlib

    from dbt_lab_spark.llm.curation import compression_ratio

    import random

    rng = random.Random(4)
    natural = " ".join(
        rng.choice(["scan", "join", "filter", "merge", "batch", "vector", "agg"])
        for _ in range(200)
    )
    boiler = "click here to subscribe " * 50
    noise = "".join(rng.choice("0123456789abcdef") for _ in range(800))
    rows = [(1, natural), (2, boiler), (3, noise), (4, ""), (5, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["compress_ratio"] for r in compression_ratio(docs).collect()}
    # boilerplate compresses dramatically; hex noise barely
    assert got[2] < 0.1
    assert got[3] > 0.5
    assert got[2] < got[1] < got[3]
    # exact pin: the stage is plain zlib level 6
    want = len(zlib.compress(natural.encode(), 6)) / len(natural.encode())
    assert got[1] == pytest.approx(want)
    # degenerate inputs
    assert got[4] == 1.0 and got[5] == 1.0


def test_bloom_decontamination_matches_exact_path(spark):
    """Bloom pre-filter must be result-invariant: no false negatives,
    and false positives die at the verify join."""
    from dbt_lab_spark.llm.curation import bloom_decontamination_pairs

    shared = "one two three four five six seven eight"
    shared2 = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [(i, f"filler {i} tokens padding more filler junk words here") for i in range(40)]
        + [(100, f"prefix junk {shared} suffix junk words"),
           (101, f"{shared2} and some trailing content after it"),
           (102, f"double hit {shared} plus {shared2} in one doc")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(900, f"{shared} trailing eval tokens"),
         (901, f"leading eval tokens {shared2}"),
         (902, "unrelated eval doc text entirely with its own words")],
        "doc_id long, text string",
    )
    exact = sorted(map(tuple, decontamination_pairs(train, ev, k=8).collect()))
    bloom = sorted(map(tuple, bloom_decontamination_pairs(train, ev, k=8).collect()))
    assert bloom == exact
    assert (100, 900) in {(a, b) for a, b, _ in exact}
    assert (101, 901) in {(a, b) for a, b, _ in exact}
    assert (102, 900) in {(a, b) for a, b, _ in exact}


def test_bloom_decontamination_empty_eval_set(spark):
    from dbt_lab_spark.llm.curation import bloom_decontamination_pairs

    train = spark.createDataFrame(
        [(1, "some training doc tokens going nowhere fast here now")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([], "doc_id long, text string")
    assert bloom_decontamination_pairs(train, ev, k=8).count() == 0


def test_bloom_build_no_false_negatives_and_bounded_fp():
    import numpy as np

    from dbt_lab_spark.llm.curation import _bloom_build

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    bits_bytes, mask, n_hash = _bloom_build(members, fpp=0.01)
    bits = np.frombuffer(bits_bytes, dtype=np.uint8)

    def probe(h1):
        h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
        h2 ^= h2 >> np.uint64(31)
        h2 |= np.uint64(1)
        keep = np.ones(len(h1), dtype=bool)
        for i in range(n_hash):
            idx = (h1 + np.uint64(i) * h2) & np.uint64(mask)
            keep &= (((bits[idx >> np.uint64(3)] >> (idx & np.uint64(7)).astype(np.uint8)) & 1)).astype(bool)
        return keep

    assert probe(members).all()  # zero false negatives, by construction
    others = rng.integers(0, 2**63, size=50_000, dtype=np.int64).astype(np.uint64)
    fp = probe(others).mean()
    assert fp < 0.05  # ~1% nominal; generous margin for hash variance


def test_canonicalize_url_edge_cases(spark):
    """Every rewrite rule plus the cases the regexes must NOT touch:
    root path keeps its slash, :8080 is not a default port, the path's
    case survives, an all-tracking query yields no '?', url params sort
    bytewise."""
    from dbt_lab_spark.llm.curation import canonicalize_url, registered_domain, url_host

    cases = [
        ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1#f", "http://www.ex.com/A/b?a=1&b=2"),
        ("http://ex.com:80/", "http://ex.com/"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),
        ("https://Ex.Com/p?fbclid=1&gclid=2&ref=3&utm_x=4", "http://ex.com/p"),
        ("http://a.b.ex.com/Path/Case", "http://a.b.ex.com/Path/Case"),
        ("http://ex.com/p?z=1&y=2&x=3", "http://ex.com/p?x=3&y=2&z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    assert got == [want for _, want in cases]

    hosts = df.select(registered_domain(url_host("url")).alias("d")).collect()
    assert [r.d for r in hosts] == [
        "ex.com", "ex.com", "ex.com", "ex.com", "ex.com", "ex.com"
    ]


def test_k_anonymity_classes(spark):
    from dbt_lab_spark.llm.curation import k_anonymity_classes

    rows = [("a", 1)] * 5 + [("a", 2)] * 4 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "seg string, band int")
    out = {
        (r.seg, r.band): (r.n_rows, r.is_safe)
        for r in k_anonymity_classes(df, ["seg", "band"], k=5).collect()
    }
    assert out == {("a", 1): (5, True), ("a", 2): (4, False), ("b", 1): (1, False)}


def test_l_diversity_extension(spark):
    """A k-anonymous class whose members all share one sensitive value
    fails distinct l-diversity (the homogeneity attack)."""
    from dbt_lab_spark.llm.curation import k_anonymity_classes

    rows = [("a", "flu")] * 5 + [("b", "flu")] * 3 + [("b", "hiv")] * 2
    df = spark.createDataFrame(rows, "seg string, dx string")
    out = {
        r.seg: (r.n_rows, r.n_sensitive, r.is_safe)
        for r in k_anonymity_classes(df, ["seg"], k=5, sensitive_col="dx", l=2).collect()
    }
    assert out["a"] == (5, 1, False)  # k ok, homogeneous -> unsafe
    assert out["b"] == (5, 2, True)
