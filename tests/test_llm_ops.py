"""Pin-tests for the approximate dedup / similarity operators: the
rows-only queries in the declared workload (minhash, simhash, LSH knn,
embedding LSH) are verified here against exact recomputation on planted
synthetic data — the strong check the DuckDB oracle can't express for
seeded-hash algorithms.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.llm.dedup import (
    embedding_dedup_pairs,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from dbt_lab_spark.llm.similarity import brute_force_knn, lsh_knn

WORDS = [f"w{i}" for i in range(200)]


def _doc(rng: random.Random, n: int = 60) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _edit(rng: random.Random, text: str, n_edits: int) -> str:
    toks = text.split()
    for _ in range(n_edits):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """100 base docs + a near-duplicate (2 token edits out of 60) for
    each of the first 20 — known ground-truth near-dup pairs."""
    rng = random.Random(1234)
    rows = []
    for i in range(100):
        rows.append((i, _doc(rng)))
    for i in range(20):
        rows.append((100 + i, _edit(rng, rows[i][1], 2)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _true_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t: str) -> set[str]:
        toks = t.lower().split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_finds_planted_near_dups(spark, planted_docs):
    pairs = minhash_dedup_pairs(
        planted_docs, num_hashes=64, shingle_k=3, num_bands=16, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # every planted pair has true 3-gram jaccard far above threshold
    # (2/60 token edits); 16 bands x 4 rows captures J>=0.8 w.p. ~1-3e-9
    planted = {(i, 100 + i) for i in range(20)}
    assert planted <= found, f"missed planted pairs: {planted - found}"


def test_minhash_estimate_tracks_true_jaccard(spark, planted_docs):
    texts = {r.doc_id: r.text for r in planted_docs.collect()}
    pairs = minhash_dedup_pairs(
        planted_docs, num_hashes=64, shingle_k=3, num_bands=16, threshold=0.5
    ).collect()
    assert pairs, "no pairs returned"
    for r in pairs:
        true_j = _true_jaccard(texts[r.id_a], texts[r.id_b])
        # 64-hash estimator: std ≈ sqrt(J(1-J)/64) ≤ 0.0625; allow 4σ
        assert abs(r.est_jaccard - true_j) <= 0.25, (r.id_a, r.id_b, r.est_jaccard, true_j)


def test_minhash_no_false_positives_on_unrelated(spark, planted_docs):
    """Unrelated random docs (J ≈ 0) must not pass the 0.5 threshold."""
    pairs = minhash_dedup_pairs(
        planted_docs, num_hashes=64, shingle_k=3, num_bands=16, threshold=0.5
    ).collect()
    texts = {r.doc_id: r.text for r in planted_docs.collect()}
    for r in pairs:
        assert _true_jaccard(texts[r.id_a], texts[r.id_b]) >= 0.25, (
            "false positive far from threshold",
            r,
        )


def test_ngram_jaccard_verifier_is_exact(spark, planted_docs):
    sigs = minhash_signatures(planted_docs, num_hashes=64, shingle_k=3)
    cand = minhash_lsh_candidates(sigs, num_bands=16, rows_per_band=4)
    out = ngram_jaccard_pairs(planted_docs, cand, shingle_k=3, threshold=0.5).collect()
    texts = {r.doc_id: r.text for r in planted_docs.collect()}
    assert out
    for r in out:
        assert math.isclose(r.jaccard, _true_jaccard(texts[r.id_a], texts[r.id_b]))


def test_simhash_detects_minor_edits(spark, planted_docs):
    pairs = simhash_dedup_pairs(planted_docs, max_hamming=12).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    planted = {(i, 100 + i) for i in range(20)}
    # 2/60 token edits flip few simhash bits; most planted pairs collide
    assert len(planted & found) >= 15, f"simhash found only {len(planted & found)}/20"
    for r in pairs:
        assert r.hamming <= 12


@pytest.fixture(scope="module")
def planted_vectors(spark):
    """60 random unit-ish vectors + a high-cosine perturbation of each of
    the first 20 (ids 100+i) — known near-neighbor ground truth."""
    rng = random.Random(99)
    dim = 64
    rows = []
    base = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        base.append(v)
        rows.append((i, v))
    for i in range(20):
        rows.append((100 + i, [x + rng.gauss(0, 0.08) for x in base[i]]))
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )


def test_embedding_lsh_is_subset_of_exact_and_high_recall(spark, planted_vectors):
    # ground truth by brute force (no LSH): theta-join all pairs
    from dbt_lab_spark.functions.vectors import cosine_similarity, to_double_array

    v = planted_vectors.select(
        F.col("vec_id"), to_double_array("embedding").alias("v")
    )
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("v_a"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("v_b"))
    truth = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= 0.9)
        .collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(
            planted_vectors, threshold=0.9, num_planes=8, num_tables=8
        ).collect()
    }
    assert approx <= truth, "LSH produced a pair the exact verify should have rejected"
    planted = {(i, 100 + i) for i in range(20)} & truth
    assert planted, "sanity: perturbations should be above 0.9 cosine"
    recall = len(approx & planted) / len(planted)
    # sigma=0.08 perturbation => cosine ~0.997, theta~4.6deg: per-table
    # collision (1-theta/pi)^8 ~ 0.81, OR over 8 tables ~ 1.0
    assert recall >= 0.8, f"recall {recall}"


def test_lsh_knn_recovers_planted_neighbor(spark, planted_vectors):
    queries = planted_vectors.filter(F.col("vec_id") >= 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = planted_vectors.filter(F.col("vec_id") < 100)
    exact = brute_force_knn(corpus, queries, k=1).collect()
    # the planted source (query_id - 100) must be the exact 1-NN
    for r in exact:
        assert r.neighbor_id == r.query_id - 100
    approx = lsh_knn(corpus, queries, k=1, num_planes=6, num_tables=8).collect()
    hits = sum(1 for r in approx if r.neighbor_id == r.query_id - 100)
    assert hits >= 16, f"lsh_knn top-1 recall {hits}/20"


def test_ivf_knn_recovers_planted_neighbor(spark, planted_vectors):
    from dbt_lab_spark.llm.similarity import brute_force_knn, ivf_centroids, ivf_knn

    queries = planted_vectors.filter(F.col("vec_id") >= 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = planted_vectors.filter(F.col("vec_id") < 100)
    cents = ivf_centroids(corpus, num_centroids=8, iters=3)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # training is deterministic: same inputs -> identical centroids
    assert cents == ivf_centroids(corpus, num_centroids=8, iters=3)
    approx = ivf_knn(corpus, queries, cents, k=1, nprobe=4).collect()
    hits = sum(1 for r in approx if r.neighbor_id == r.query_id - 100)
    # probing half the clusters: the planted twin (cosine ~0.997) lands
    # in the query's own probe list essentially always
    assert hits >= 17, f"ivf top-1 recall {hits}/20"


def test_ivf_probe_all_matches_brute_force(spark, planted_vectors):
    """nprobe == num_centroids degrades IVF to exact search — results
    must equal brute force (same ids, same ranks)."""
    from dbt_lab_spark.llm.similarity import brute_force_knn, ivf_centroids, ivf_knn

    queries = planted_vectors.filter(F.col("vec_id") >= 110).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = planted_vectors.filter(F.col("vec_id") < 100)
    cents = ivf_centroids(corpus, num_centroids=4, iters=2)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_knn(corpus, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_knn(corpus, queries, cents, k=5, nprobe=4).collect()
    }
    assert ivf == exact


def test_jvm_scorer_matches_numpy_scorer(spark, planted_vectors):
    """scorer='jvm' (sequential-fold cosine on raw vectors, the oracle
    contract) must agree with the default Arrow/NumPy scorer: identical
    (query, rank) -> neighbor maps for ivf_knn, identical pair sets for
    semantic_dedup_pairs, cosines within float-summation-order slack."""
    from dbt_lab_spark.llm.dedup import semantic_dedup_pairs
    from dbt_lab_spark.llm.similarity import ivf_centroids, ivf_knn

    queries = planted_vectors.filter(F.col("vec_id") >= 110).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = planted_vectors.filter(F.col("vec_id") < 100)
    cents = ivf_centroids(corpus, num_centroids=4, iters=0)
    by_scorer = {}
    for scorer in ("numpy", "jvm"):
        rows = ivf_knn(corpus, queries, cents, k=5, nprobe=2, scorer=scorer).collect()
        by_scorer[scorer] = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in rows}
    assert by_scorer["numpy"].keys() == by_scorer["jvm"].keys()
    for key, (nid, cos) in by_scorer["numpy"].items():
        jid, jcos = by_scorer["jvm"][key]
        assert nid == jid
        assert abs(cos - jcos) < 1e-9

    for scorer in ("numpy", "jvm"):
        rows = semantic_dedup_pairs(
            planted_vectors, num_clusters=4, threshold=0.9, iters=0, scorer=scorer
        ).collect()
        by_scorer[scorer] = {(r.id_a, r.id_b): r.cosine for r in rows}
    assert by_scorer["numpy"].keys() == by_scorer["jvm"].keys()
    for key, cos in by_scorer["numpy"].items():
        assert abs(cos - by_scorer["jvm"][key]) < 1e-9


def test_minhash_bucket_cap_is_subset_and_keeps_planted(spark, planted_docs):
    """The hot-bucket guard only removes pairs (subset of uncapped) and,
    at a sane cap, keeps the planted near-dups (their buckets are tiny)."""
    sigs = minhash_signatures(planted_docs, num_hashes=64, shingle_k=3)
    uncapped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(sigs, num_bands=16, rows_per_band=4).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            sigs, num_bands=16, rows_per_band=4, max_bucket_size=10
        ).collect()
    }
    assert capped <= uncapped
    planted = {(i, 100 + i) for i in range(20)}
    assert planted <= capped


def test_connected_components_matches_union_find(spark):
    """CC label propagation vs a python union-find on a graph with
    chains (transitive dups), a star, and isolated pairs."""
    from dbt_lab_spark.llm.dedup import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> one component {1,2,3,4}
        (10, 11), (10, 12), (10, 13),    # star
        (20, 21),                        # pair
        (30, 31), (31, 32), (30, 32),    # triangle
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(pairs).collect()}

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want


def test_connected_components_deep_chain_converges(spark):
    """A 200-link duplicate chain has diameter 200 — plain min-label
    propagation would need 200 rounds and silently return partial
    clusters at max_iter=20.  The pointer-jumping shortcut must
    converge within the default cap and label every node with the
    chain head."""
    from dbt_lab_spark.llm.dedup import connected_components

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_strict_raises_on_cap(spark):
    """With an artificially tiny iteration budget the strict default
    must raise instead of returning partial labels; strict=False
    returns best-effort."""
    import pytest

    from dbt_lab_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2).collect()
    best_effort = connected_components(pairs, max_iter=2, strict=False)
    assert best_effort.count() == 65


def test_dedup_apply_keeps_one_per_cluster(spark, planted_docs):
    """End-to-end: minhash pairs -> CC -> apply keeps exactly one doc
    per planted near-dup pair and every unpaired doc."""
    from dbt_lab_spark.llm.dedup import dedup_apply

    pairs = minhash_dedup_pairs(
        planted_docs, num_hashes=64, shingle_k=3, num_bands=16, threshold=0.5
    )
    kept = {r.doc_id for r in dedup_apply(planted_docs, pairs).collect()}
    pair_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    paired_ids = {x for ab in pair_rows for x in ab}
    # every unpaired doc survives
    all_ids = {r.doc_id for r in planted_docs.collect()}
    assert (all_ids - paired_ids) <= kept
    # planted originals survive, their copies don't (min-id representative)
    for i in range(20):
        if (i, 100 + i) in pair_rows:
            assert i in kept and (100 + i) not in kept


def test_lm_quality_score_pinned(spark):
    """Hand-computed add-one unigram LM on a 3-doc corpus."""
    import math

    from dbt_lab_spark.llm.curation import lm_quality_score

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["lm_score"], r["n_tokens"])
           for r in lm_quality_score(docs).collect()}
    # corpus tokens: a=3, b=2 -> N=5, V=2
    lp_a = math.log((3 + 1) / (5 + 2))
    lp_b = math.log((2 + 1) / (5 + 2))
    assert got[1] == (round((2 * lp_a + lp_b) / 3, 4), 3)
    assert got[2] == (round((lp_a + lp_b) / 2, 4), 2)
    assert 3 not in got  # empty doc emits no tokens


def test_token_kl_drift_orders_sources_by_divergence(spark):
    """A slice with the corpus-typical distribution scores lower KL than
    a slice of rare-token soup."""
    from dbt_lab_spark.llm.curation import token_kl_drift

    rows = [("typical", "the cat sat on the mat")] * 10 + [
        ("drifted", "zyx qwv jkl pqr zzz xxx")
    ] * 2
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r["kl_drift"] for r in token_kl_drift(docs).collect()}
    assert got["drifted"] > got["typical"] >= 0.0


def test_semantic_dedup_catches_planted_duplicates(spark):
    """Identical vectors always co-assign to one k-means cluster, so
    planted exact duplicates must always be caught; well-separated
    distinct vectors must never pair at a high threshold."""
    from dbt_lab_spark.llm.dedup import semantic_dedup_keep, semantic_dedup_pairs

    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        v = rng.normal(size=16)
        v = (v / np.linalg.norm(v)).tolist()
        rows.append((i, v))
    # plant duplicates: ids 100..109 duplicate ids 0..9 exactly
    for i in range(10):
        rows.append((100 + i, rows[i][1]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup_pairs(emb, num_clusters=4, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, 100 + i) for i in range(10)} <= got
    # random 16-dim unit vectors essentially never hit cosine>=0.999
    assert got == {(i, 100 + i) for i in range(10)}
    kept = semantic_dedup_keep(emb, num_clusters=4, threshold=0.999)
    ids = {r["vec_id"] for r in kept.collect()}
    assert len(ids) == 60 and all(100 + i not in ids for i in range(10))


def test_ngram_jaccard_hot_shingle_cap_keeps_exactness(spark):
    """max_doc_freq drops boilerplate shingles from the inverted index
    but re-verifies candidates on the full arrays: on a corpus where
    every doc shares a boilerplate header, the capped result must equal
    the uncapped result pair-for-pair WITH identical (exact) jaccard
    values — the near-dup pairs share plenty of rare shingles."""
    from dbt_lab_spark.llm.dedup import ngram_jaccard_all_pairs

    rng = random.Random(77)
    boiler = "terms of service apply to all content herein"
    rows = []
    for i in range(60):
        rows.append((i, boiler + " " + _doc(rng, 40)))
    for i in range(10):  # near-dups of the first 10
        rows.append((100 + i, _edit(rng, rows[i][1], 2)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_all_pairs(docs, shingle_k=3, threshold=0.5).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_all_pairs(
            docs, shingle_k=3, threshold=0.5, max_doc_freq=20
        ).collect()
    }
    assert set(capped) == set(exact), (set(exact) ^ set(capped))
    for k, v in capped.items():
        assert math.isclose(v, exact[k]), (k, v, exact[k])
    # the planted pairs are all found
    assert {(i, 100 + i) for i in range(10)} <= set(capped)


def test_reliable_checkpoint_paths(spark, tmp_path, planted_vectors):
    """checkpoint_dir= switches connected_components rounds and the
    ivf_centroids source cache from executor-memory localCheckpoint/
    persist to RELIABLE checkpoints: results must be identical to the
    default path and durable checkpoint files must actually appear
    under the directory (the executor-loss recovery source)."""
    import os

    from dbt_lab_spark.llm.dedup import connected_components
    from dbt_lab_spark.llm.similarity import ivf_centroids

    cc_dir = str(tmp_path / "cc_ckpt")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    base = {(r.id, r.component) for r in connected_components(pairs).collect()}
    reliable = {
        (r.id, r.component)
        for r in connected_components(pairs, checkpoint_dir=cc_dir).collect()
    }
    assert reliable == base
    ckpt_files = [
        os.path.join(dp, f) for dp, _, fns in os.walk(cc_dir) for f in fns
    ]
    assert ckpt_files, "no reliable checkpoint files written"

    ivf_dir = str(tmp_path / "ivf_ckpt")
    cents_default = ivf_centroids(planted_vectors, num_centroids=4, iters=2)
    cents_reliable = ivf_centroids(
        planted_vectors, num_centroids=4, iters=2, checkpoint_dir=ivf_dir
    )
    assert cents_reliable == cents_default
    ivf_files = [
        os.path.join(dp, f) for dp, _, fns in os.walk(ivf_dir) for f in fns
    ]
    assert ivf_files, "no reliable checkpoint files written for ivf source"


def test_bpe_train_hand_computed(spark):
    """BPE merge order on a tiny corpus, hand-computed: corpus
    'ab ab ab abc' -> pair (a,b) freq 4 merges first; then (ab,c)
    freq 1 is below min_freq=2 and training stops."""
    from dbt_lab_spark.llm.tokenizer import train_bpe, train_bpe_from_counts

    merges = train_bpe_from_counts({"ab": 3, "abc": 1}, num_merges=5, min_freq=2)
    assert merges == [("a", "b")]
    # deterministic tie-break: 'xy' and 'xz' both freq 2 -> lexicographic
    merges = train_bpe_from_counts({"xy": 2, "xz": 2}, num_merges=1, min_freq=2)
    assert merges == [("x", "y")]
    # end-to-end through Spark word counting
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "ab abc")], "doc_id long, text string"
    )
    assert train_bpe(docs, num_merges=5, min_freq=2) == [("a", "b")]


def test_bpe_vocab_collect_is_bounded(spark, sf_small):
    """r4 scale fix (VERDICT r3 #4): the train_bpe driver collect must
    be bounded.  (a) On the test corpus the default word_min_freq=2 /
    max_vocab cap leaves trained merges UNCHANGED vs the exact
    unfiltered statistics; (b) on a synthetic long-tail corpus (every
    word a distinct hapax) the bounded path collects 0 rows where the
    unfiltered path would stream the whole distinct-word domain; (c)
    max_vocab caps the collected row count deterministically."""
    from dbt_lab_spark.llm.tokenizer import (
        train_bpe,
        train_bpe_from_counts,
        word_counts,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exact = {
        r["word"]: r["cnt"] for r in word_counts(docs).collect()
    }
    assert train_bpe(docs, num_merges=60) == train_bpe_from_counts(exact, 60, 2)

    # long-tail corpus: 500 docs x 4 distinct hapax "words" each
    tail = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(500)],
        "doc_id long, text string",
    )
    wc = word_counts(tail)
    assert wc.filter(F.col("cnt") >= 2).count() == 0  # bounded collect: 0 rows
    assert train_bpe(tail, num_merges=5) == []  # refused tail -> no merges
    # cap path: common words survive, collect bounded by max_vocab
    mixed = tail.union(
        spark.createDataFrame([(9999, "the the the of of")], "doc_id long, text string")
    )
    capped = (
        word_counts(mixed)
        .filter(F.col("cnt") >= 2)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(1)
    )
    assert [r["word"] for r in capped.collect()] == ["the"]


def test_bpe_tail_heavy_merge_pin(spark):
    """ADVICE r4: pin trained merges on a TAIL-HEAVY corpus where the
    hapax mass genuinely shifts pair rankings, so the word_min_freq=2
    default's behavior is a documented contract, not a silent change.
    Head: 'ab'x3.  Tail: 40 distinct hapaxes all containing pair
    (c,d) — unfiltered, (c,d) has freq 40 and wins the first merge;
    filtered (default), the tail is dropped and (a,b) wins.  Both
    outcomes are pinned exactly."""
    from dbt_lab_spark.llm.tokenizer import train_bpe

    rows = [(0, "ab ab ab")] + [(i + 1, f"w{i}cd") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # Default (scale-safe) path: tail filtered, head pair wins.
    assert train_bpe(docs, num_merges=1, min_freq=2) == [("a", "b")]
    # Exact-statistics opt-out: tail pairs dominate.
    assert train_bpe(
        docs, num_merges=1, min_freq=2, word_min_freq=1, max_vocab=None
    ) == [("c", "d")]


def test_bpe_encode_applies_merges_in_rank_order(spark):
    """Encoding must apply the LOWEST-rank merge first (standard BPE):
    with merges [(a,b), (ab,c)], 'abc' -> ['abc'], 'abd' -> ['ab','d'],
    'xyz' (no merges) -> 3 single chars."""
    from dbt_lab_spark.llm.tokenizer import bpe_encode

    docs = spark.createDataFrame(
        [(0, "abc abd xyz"), (1, "abc abc")], "doc_id long, text string"
    )
    merges = [("a", "b"), ("ab", "c")]
    rows = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert rows[0]["n_words"] == 3
    assert rows[0]["n_bpe_tokens"] == 1 + 2 + 3
    assert rows[0]["tokens_head"] == ["abc", "ab", "d", "x", "y", "z"]
    assert rows[1]["n_bpe_tokens"] == 2


def test_bpe_compresses_real_corpus(spark, sf_small):
    """Trained merges must strictly compress the corpus they were
    trained on (tokens < characters) and more merges compress more."""
    from dbt_lab_spark.llm.tokenizer import bpe_encode, train_bpe

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    m20 = train_bpe(docs, num_merges=20)
    m80 = train_bpe(docs, num_merges=80)
    assert len(m80) > len(m20)
    assert m80[: len(m20)] == m20  # merge list is a deterministic prefix chain
    t20 = bpe_encode(docs, m20).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
    t80 = bpe_encode(docs, m80).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
    n_chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")))
    ).collect()[0][0]
    assert t80 < t20 < n_chars


def test_dup_spans_finds_planted_passage(spark):
    """A 10-token passage planted into 3 of 40 docs must surface all
    its 8-token windows with n_docs == 3; unique text yields none."""
    from dbt_lab_spark.llm.dedup import dup_spans

    rng = random.Random(5)
    passage = " ".join(rng.choice(WORDS) for _ in range(10))
    rows = []
    for i in range(40):
        body = _doc(rng, 30)
        if i in (3, 17, 29):
            body = body + " " + passage
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_spans(docs, span_tokens=8, min_docs=2).collect()
    # the planted passage contributes 10-8+1 = 3 windows in 3 docs
    planted = [r for r in out if r["n_docs"] >= 3]
    assert len(planted) >= 3, out
    for r in planted:
        assert r["n_occurrences"] >= r["n_docs"]
        assert r["min_doc_id"] == 3


def test_dup_spans_winnowed_keeps_long_passage_guarantee(spark):
    """The winnowed scale path must still catch a shared passage of
    >= span + w - 1 tokens (the MOSS guarantee) while emitting far
    fewer fingerprint rows than the exact path."""
    from dbt_lab_spark.llm.dedup import dup_spans

    rng = random.Random(9)
    passage = " ".join(rng.choice(WORDS) for _ in range(16))  # 16 >= 8+5-1
    rows = []
    for i in range(30):
        body = _doc(rng, 30)
        if i in (2, 11):
            body = body + " " + passage
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = dup_spans(docs, span_tokens=8, min_docs=2)
    winnowed = dup_spans(docs, span_tokens=8, min_docs=2, winnow_w=5)
    shared_w = {r["fp"] for r in winnowed.collect()}
    assert shared_w, "winnowed path missed the planted long passage"
    # winnowed fingerprints are a subset of the exact duplicated spans
    shared_e = {r["fp"] for r in exact.collect()}
    assert shared_w <= shared_e


def test_bm25_matches_hand_formula(spark):
    import math

    from dbt_lab_spark.functions.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["apple", "cherry"]).collect()}

    def ref(tf, df, dl, n=3, avgdl=3.0, k1=1.2, b=0.75):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(ref(tf=2, df=1, dl=3))  # 'apple' only
    assert got[2] == pytest.approx(ref(tf=1, df=2, dl=2))  # 'cherry' only
    assert got[3] == pytest.approx(ref(tf=3, df=2, dl=4))
    # docs matching no term are absent, not zero-scored
    assert set(got) == {1, 2, 3}

    extra = spark.createDataFrame([(9, "nothing relevant")], "doc_id long, text string")
    got2 = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs.union(extra), ["apple"]).collect()
    }
    assert 9 not in got2


def test_cjk_aware_token_count(spark):
    from dbt_lab_spark.functions.text import cjk_aware_token_count

    rows = [
        (1, "hello world"),            # 2 plain tokens
        (2, "中文处理"),                 # 4 Han chars -> 4 tokens
        (3, "mixed 中文 and 漢字 text"),  # 3 words + 4 Han
        (4, "日本語のテスト"),            # kana NOT Han: 3 Han (日本語) + 1 word run? 
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", cjk_aware_token_count("text").alias("n")
        ).collect()
    }
    assert got[1] == 2
    assert got[2] == 4
    assert got[3] == 7
    # 日本語 are Han; のテスト is kana/katakana -> one whitespace token
    assert got[4] == 3 + 1
    assert got[5] == 0
    # plain-ASCII text agrees with naive whitespace counting
    from dbt_lab_spark.functions.text import token_count

    plain = spark.createDataFrame([(1, "a b  c d")], "doc_id long, text string")
    a, b = plain.select(
        cjk_aware_token_count("text").alias("a"), token_count("text").alias("b")
    ).first()
    assert a == b == 4


def test_cjk_token_count_matches_duckdb_re2(spark):
    """The Java \\p{IsHan} and RE2 \\p{Han} classes agree — pinned on
    mixed text so a SQL oracle could mirror the expression."""
    import duckdb

    from dbt_lab_spark.functions.text import cjk_aware_token_count

    texts = ["中文abc漢字 def", "no cjk at all", "汉字 mixed 测试 tokens"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", cjk_aware_token_count("text").alias("n")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            r"""SELECT length(regexp_extract_all(lower(trim(?)), '\p{Han}'))
                + len(list_filter(string_split_regex(
                      regexp_replace(lower(trim(?)), '\p{Han}', ' ', 'g'), '\s+'),
                      x -> x <> ''))""",
            [t, t],
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
