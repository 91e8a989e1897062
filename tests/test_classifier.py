"""Pins for the hashing-trick linear classifier (llm/classifier.py):
feature hashing on the md5 oracle plane, distributed full-batch
training (plain GD and AdaGrad), JVM-side scoring parity."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.llm.classifier import (
    hash_features,
    prepare_training,
    score_logreg,
    train_logreg,
    weights_table,
)


def _expected_idx(term: str, n_features: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_features


def test_hash_features_md5_plane_pinned(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta")], "doc_id long, text string"
    )
    nf = 1 << 16
    rows = hash_features(docs, n_features=nf).collect()
    got = {(r["doc_id"], r["idx"]): r["tf"] for r in rows}
    # doc 1: unigrams alpha x2, beta x1; bigrams 'alpha beta', 'beta alpha'
    assert got[(1, _expected_idx("alpha", nf))] == 2.0
    assert got[(1, _expected_idx("beta", nf))] == 1.0
    assert got[(1, _expected_idx("alpha beta", nf))] == 1.0
    assert got[(1, _expected_idx("beta alpha", nf))] == 1.0
    # doc 2: single token, no bigrams
    assert got[(2, _expected_idx("beta", nf))] == 1.0
    assert len([k for k in got if k[0] == 2]) == 1


def test_hash_features_casefold_and_whitespace(spark):
    docs = spark.createDataFrame([(1, "  Hello   WORLD  ")], "doc_id long, text string")
    nf = 1 << 16
    rows = hash_features(docs, n_features=nf).collect()
    idxs = {r["idx"] for r in rows}
    assert _expected_idx("hello", nf) in idxs
    assert _expected_idx("world", nf) in idxs
    assert _expected_idx("hello world", nf) in idxs


def _planted(spark, n=120, seed=2):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        toks = [f"f{rng.randrange(40)}" for _ in range(15)]
        toks += ["goodmark"] if pos else ["badmark"]
        rng.shuffle(toks)
        rows.append((i, " ".join(toks), 1 if pos else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_train_separable_converges_and_scores(spark):
    docs = _planted(spark)
    nf = 1 << 13
    feats = hash_features(docs, n_features=nf)
    prep = prepare_training(feats, docs)
    w, b, losses = train_logreg(prep, n_features=nf, iters=20)
    assert losses[0] == pytest.approx(np.log(2), abs=1e-6)  # w=0 start
    assert all(losses[i + 1] < losses[i] for i in range(len(losses) - 1))
    scored = score_logreg(feats, weights_table(spark, w), b).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    acc = scored.select(
        F.avg(((F.col("score") > 0.5).cast("int") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc == 1.0  # separable corpus: perfect training accuracy


def test_train_adagrad_beats_plain_gd(spark):
    docs = _planted(spark, seed=5)
    nf = 1 << 13
    prep = prepare_training(hash_features(docs, n_features=nf), docs).persist()
    _, _, plain = train_logreg(prep, n_features=nf, iters=10, lr=0.5)
    _, _, ada = train_logreg(prep, n_features=nf, iters=10, lr=0.5, adagrad=True)
    prep.unpersist()
    assert ada[-1] < plain[-1]
    assert all(np.isfinite(ada))


def test_train_deterministic_under_repartition(spark):
    docs = _planted(spark, n=60, seed=9)
    nf = 1 << 12
    f1 = hash_features(docs, n_features=nf)
    f2 = hash_features(docs.repartition(13), n_features=nf)
    w1, b1, l1 = train_logreg(prepare_training(f1, docs), n_features=nf, iters=8)
    w2, b2, l2 = train_logreg(prepare_training(f2, docs), n_features=nf, iters=8)
    # float64 partial reduction is order-sensitive in the last ulps, so
    # compare to tight tolerance, and losses exactly at first iteration
    assert l1[0] == l2[0]
    assert np.allclose(w1, w2, atol=1e-12)
    assert b1 == pytest.approx(b2, abs=1e-12)


def test_score_matches_numpy_reference(spark):
    docs = _planted(spark, n=40, seed=11)
    nf = 1 << 12
    feats = hash_features(docs, n_features=nf)
    w, b, _ = train_logreg(prepare_training(feats, docs), n_features=nf, iters=5)
    spark_scores = {
        r["doc_id"]: r["score"]
        for r in score_logreg(feats, weights_table(spark, w), b).collect()
    }
    # numpy reference straight from the sparse features
    rows = feats.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["idx"], r["tf"]))
    for doc_id, pairs in by_doc.items():
        ii = np.array([p[0] for p in pairs])
        lv = np.log1p(np.array([p[1] for p in pairs]))
        vv = lv / np.sqrt((lv * lv).sum())
        z = float(w[ii] @ vv) + b
        assert spark_scores[doc_id] == pytest.approx(1 / (1 + np.exp(-z)), rel=1e-9)


def test_empty_training_set_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, idxs array<int>, vals array<double>, label double")
    with pytest.raises(ValueError, match="empty"):
        train_logreg(empty, n_features=16, iters=1)


def test_stream_scorer_matches_batch_scorer(spark, tmp_path):
    """score_logreg_stream (map-only, streaming-safe) must produce the
    identical scores as the batch hash_features+score_logreg path —
    both in batch mode and under readStream."""
    docs = _planted(spark, n=50, seed=21)
    nf = 1 << 12
    feats = hash_features(docs, n_features=nf)
    w, b, _ = train_logreg(prepare_training(feats, docs), n_features=nf, iters=6)
    from dbt_lab_spark.llm.classifier import score_logreg_stream

    batch = {
        r["doc_id"]: r["score"]
        for r in score_logreg(feats, weights_table(spark, w), b).collect()
    }
    maponly = {
        r["doc_id"]: r["score"]
        for r in score_logreg_stream(docs, w, b, n_features=nf).collect()
    }
    assert maponly.keys() == batch.keys()
    for k in batch:
        assert maponly[k] == pytest.approx(batch[k], rel=1e-12)

    # the same stage under readStream
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        score_logreg_stream(stream, w, b, n_features=nf)
        .writeStream.format("memory")
        .queryName("clf_scores")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r["doc_id"]: r["score"]
            for r in spark.sql("SELECT * FROM clf_scores").collect()
        }
    finally:
        q.stop()
    assert streamed == maponly


def test_hashed_doc_embedding_pinned(spark):
    import hashlib

    from dbt_lab_spark.llm.classifier import hashed_doc_embedding

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in hashed_doc_embedding(docs, dim=8).collect()}

    def sign_vec(tok, dim=8):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return [((h >> d) & 1) * 2 - 1 for d in range(dim)]

    import numpy as np

    want1 = (
        2 * np.array(sign_vec("alpha")) + np.array(sign_vec("beta"))
    ).astype(float)
    assert got[1]["emb"] == list(want1)
    assert got[1]["n_tokens"] == 3
    assert got[2]["emb"] == [float(v) for v in sign_vec("gamma")]
    # similar docs -> close vectors; disjoint docs -> independent signs
    sim = spark.createDataFrame(
        [(1, "x y z w q r s t"), (2, "x y z w q r s t u")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: np.array(r["emb"]) for r in hashed_doc_embedding(sim, dim=16).collect()}
    assert np.abs(rows[1] - rows[2]).sum() <= 16  # differ by one token's signs


def test_doc_embeddings_cluster_planted_topics(spark):
    """Composition evidence: hashed random-indexing doc embeddings +
    the spherical k-means trainer separate two planted vocabularies —
    the model-free clustering path for corpora without an encoder."""
    import numpy as np

    from dbt_lab_spark.llm.classifier import hashed_doc_embedding
    from dbt_lab_spark.llm.similarity import ivf_assign, ivf_centroids

    import random

    rng = random.Random(3)
    vocab_a = [f"alpha{j}" for j in range(30)]
    vocab_b = [f"beta{j}" for j in range(30)]
    rows = []
    for i in range(80):
        vocab = vocab_a if i % 2 == 0 else vocab_b
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(25))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_doc_embedding(docs, dim=32).select(
        F.col("doc_id").alias("vec_id"), F.col("emb").alias("embedding")
    )
    cents = ivf_centroids(emb, num_centroids=2, iters=6, dim=32)
    assigned = {r["neighbor_id"]: r["cluster"] for r in ivf_assign(emb, cents).collect()}
    evens = {assigned[i] for i in range(0, 80, 2)}
    odds = {assigned[i] for i in range(1, 80, 2)}
    # the two planted vocabularies land in two distinct clusters
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
