#!/usr/bin/env python
"""Benchmark harness: runs the headline query set (BASELINE.md BENCH-QS
plus the beyond-reference training-data ops) at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver records only the last ~2000 chars of stdout, so the stdout
line must stay SHORT: `queries` holds the HEADLINE subset only (the
r1-common core + TPC-H + the r3-flagged six), plus the full-set total
and count.  The complete per-query map is written to
BENCH_LOCAL_latest.json in the repo root (committed per round as
BENCH_LOCAL_r{N}.json), so the ledger survives any tail window.
All progress chatter goes to stderr; console progress is disabled.

Timing: median of 3 runs per query after 1 warm-up; each run fully
materializes the result via the noop sink (no driver collect cost).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import DataFrame

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.operators.sort import sort
from dbt_lab_spark.session import get_spark
from dbt_lab_spark.workload import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# BENCH-QS (BASELINE.md §2) + beyond-reference headliners.
BENCH_NAMES = [
    # session-4 additions (stats/eval/resampling/layout/graph/LLM-curation)
    "q_pr_curve",
    "q_theil_sen",
    "q_ridge",
    "q_bootstrap_ci",
    "q_zorder",
    "q_arrow_ipc_ingest",
    "q_dsir_sample",
    "q_assortativity",
    "q_label_prop",
    "q_approx_quantiles",
    "q_psi",
    "q_hll_window",
    "q_salted_join",
    "q_geo_nearest",
    "q_burstiness",
    "q_entropy_rate",
    "q_vocab_overlap",
    "q_top_paths",
    "q_linkage_weights",
    "q_feature_pit",
    "q_cv_ols",
    "q_ks_test",
    "q_scan_filter",
    "q_count",
    "q_group_customers",
    "q_multiway",
    "q_merge_join",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q7",
    "q_tpch_q9",
    "q_tpch_q13",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_window_rank",
    "q_sessionize",
    "q_asof_join",
    "q_range_join",
    "q_session_window",
    "q_lang_quality",
    "q_word_count",
    "q_tfidf",
    "q_time_range_frame",
    "q_seq_match",
    "q_heavy_hitters",
    "q_corpus_prep",
    "q_gap_fill",
    "q_lineitem_partitioned",
    "q_window_suite",
    "q_text_chunks",
    "q_winnow",
    "q_quantize_int8",
    "q_minhash_pairs",
    "q_ngram_jaccard",
    "q_knn_bruteforce",
    "q_pii_redact",
    "q_repetition",
    "q_decontaminate",
    "q_mix_epochs",
    "q_pack_sequences",
    "q_quality_filter",
    "q_source_cap",
    "q_incremental_dedup",
    "q_retention",
    "q_profile",
    "q_zscore_outliers",
    "q_curation_pipeline",
    "q_debounce",
    "q_share_of_total",
    # r2 additions (BASELINE.md r2 marks)
    "q_lm_quality",
    "q_kl_drift",
    "q_semantic_dedup",
    "q_sql_strict",
    "q_multimodal_real_decode",
    # r3 additions (BASELINE.md r3 marks)
    "q_dup_spans",
    "q_trigram_lm",
    "q_bpe_tokens",
    "q_image_resize",
    "q_warc_ingest",
    "q_hash_features",
    "q_pagerank",
    "q_bm25",
    "q_webdataset",
    "q_temperature_mix",
    "q_pca_project",
    "q_normalize_text",
    "q_cdc_dedup",
    "q_exif_meta",
    "q_doc_embed",
    "q_parquet_stats",
    "q_ewma",
    "q_pq_ann",
    "q_compress_ratio",
    "q_neg_sample",
    "q_mjpeg_frames",
    "q_bfs_hops",
    "q_triangles",
    "q_merge_upsert",
    "q_cooccur_pmi",
    "q_mad_outliers",
    "q_bloom_decontaminate",
    "q_dataset_diff",
    "q_entity_cc",
    "q_avro_ingest",
    "q_interp_fill",
    "q_hll_sketch",
    "q_skyline",
    "q_expectations",
    "q_scd2",
    "q_weighted_sample",
    "q_corr_matrix",
    "q_ols",
    "q_kmv_union",
    "q_table_checksum",
    "q_ngram_jaccard_pp",
    "q_acf",
    "q_rrf",
    "q_time_travel",
    "q_benford",
    "q_gini",
    "q_pdf_extract",
    "q_html_extract",
    "q_docx_extract",
    "q_ipynb_extract",
    # r3-session-3 additions: the k-means/PQ family + e2e dedup under oracles
    "q_knn_ivf_seeded",
    "q_semantic_dedup_seeded",
    "q_pq_adc_seeded",
    "q_dedup_apply_md5",
    "q_pca_power",
    "q_url_canonical",
    "q_k_anonymity",
    "q_auc_eval",
    "q_calibration",
    "q_kappa",
    "q_chi2",
    "q_ab_test",
    "q_survival",
    "q_seasonal",
    "q_attribution",
    "q_cusum",
    "q_npy_ingest",
    "q_safetensors_ingest",
    "q_logreg_step",
    "q_copurchase",
    "q_assoc_rules",
    "q_item_sim",
    "q_rfm",
    "q_abc_pareto",
    "q_forecast_eval",
    "q_fulfillment_latency",
    "q_anova",
    "q_spearman",
    "q_holt",
    "q_trimmed_mean",
    "q_entropy",
    "q_mann_kendall",
    # r3-session-5 additions: rank/order stats + interval analytics
    "q_mann_whitney",
    "q_bh_fdr",
    "q_max_concurrent",
    "q_drawdown",
    "q_link_pred",
    "q_mutual_info",
    "q_streaks",
    "q_changepoint",
    # r3-session-5 wave B: calibration/series/scoring/graph/experimentation
    "q_isotonic",
    "q_dtw",
    "q_woe_iv",
    "q_hits",
    "q_cuped",
    # r3-session-6: causal/sequential/robust-TS/order-stats/UQ
    "q_did",
    "q_sprt",
    "q_hampel",
    "q_weighted_median",
    "q_conformal",
    "q_kcore",
    "q_qq_plot",
    "q_runs_test",
    "q_split_gain",
    "q_elasticity",
    "q_event_study",
    "q_hte_segments",
    "q_tost",
    "q_permutation_test",
    "q_seasonal_strength",
    # r3-session-7: power planning, robust moments, GBDT round
    "q_mde_power",
    "q_winsorized_stats",
    "q_gbm_round",
    "q_markov_attribution",
    "q_hurst",
    "q_median_polish",
    "q_wasserstein",
    "q_kendall_tau",
    "q_hill_tail",
    "q_funnel_time",
    "q_skew_audit",
    "q_zipf_fit",
    "q_dispersion",
    "q_cronbach",
    "q_mmd",
    "q_cmh_test",
    "q_ndcg",
    "q_evt_gumbel",
    # r3-session-8: causality, risk, shrinkage, indexes, engagement
    "q_granger",
    "q_var_es",
    "q_eb_shrinkage",
    "q_price_index",
    "q_dau_wau",
    "q_dbscan_core",
    "q_srm_check",
    "q_graph_stats",
    "q_higher_moments",
    "q_ecod_outliers",
    "q_shapley_r2",
    "q_ratio_delta",
    "q_rolling_beta",
    "q_partial_corr",
    "q_burrows_delta",
    # r3-session-9: regression diagnostics + multi-change-point
    "q_breusch_pagan",
    "q_durbin_watson",
    "q_cooks_distance",
    "q_changepoint2",
    "q_jarque_bera",
    "q_theil_index",
    "q_spc_chart",
    "q_kruskal_wallis",
    "q_mcnemar",
    "q_gains_chart",
    # r4 additions
    "q_mp3_meta",
    "q_minhash_recall",
    "q_simhash_recall",
    "q_ohlc",
    "q_bollinger",
    "q_mrr",
    "q_adamic_adar",
    "q_js_divergence",
    "q_ljung_box",
    "q_friedman",
    "q_levene_bf",
    "q_grubbs",
    "q_chow_test",
    "q_vif",
    "q_engle_granger",
    "q_quantile_bucketing",
    "q_target_encoding",
    "q_type_token",
    "q_flesch",
    "q_croston",
    "q_page_hinkley",
    "q_sign_test",
    "q_cohens_d",
    "q_brier_score",
    "q_silhouette",
    "q_dup_cluster_sizes",
    "q_containment",
    "q_decay_popularity",
    "q_densify",
    "q_cumulative_users",
    "q_ngram_novelty",
    "q_nzv_audit",
    "q_hhi",
    "q_iqr_outliers",
    "q_abandonment",
    "q_lang_confusion",
    "q_length_profile",
    "q_heaps_law",
    "q_cross_source_dups",
    "q_bowley_skew",
    "q_moving_range",
    "q_two_prop_z",
    "q_odds_ratio",
    "q_cramers_v",
    "q_youden_j",
    # r5 additions
    "q_image_dedup",
    "q_image_dedup_recall",
    "q_image_phash_agreement",
    "q_compaction",
    "q_mp2_audio",
    "q_audio_dedup",
    "q_audio_dedup_recall",
    "q_video_dedup",
    "q_image_search",
    "q_merge_cow",
    "q_change_feed",
    "q_dedup_incremental",
    "q_delete_where",
    "q_audio_search",
    # r6 additions
    "q_stream_watermark",
    "q_schema_evolution",
    "q_mp3_audio",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_stateful",
    "q_constraint_gate",
    # r7 additions
    "q_delete_dv",
    "q_zorder_compact",
    "q_bloom_skip",
    "q_stream_outer_join",
    "q_jpeg_arith",
    "q_merge_dv",
    "q_stream_full_outer_join",
    "q_stream_merge_dv",
    # r8 additions
    "q_concurrent_appends",
    "q_time_travel_ts",
    "q_dv_mass_delete",
    "q_stream_right_outer",
    "q_snapshot_ann",
    # r9 additions
    "q_log_checkpoint",
    "q_stream_semi_join",
    "q_stream_anti_join",
    "q_ann_retrain",
    # r10 additions
    "q_constraint_race",
    "q_ts_prune",
    "q_stream_change_feed",
    "q_ann_partial_retrain",
]


def _q_sort_ext(spark, sf_dir: str) -> DataFrame:
    """Q-sort-ext: full multi-column asc/desc sort of lineitem
    (BASELINE.md; reference external-sort test shape)."""
    cat = Catalog(sf_dir)
    li = scan(
        spark, cat, "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"],
    )
    return sort(li, ["l_extendedprice", "l_shipdate", "l_orderkey"], [False, True, True])


# stdout-line subset: core reference queries + TPC-H + the queries the
# r3 verdict flagged — small enough that the driver's 2000-char stdout
# tail always contains the complete JSON line.
HEADLINE = [
    "q_scan_filter", "q_count", "q_group_customers", "q_multiway",
    "q_merge_join", "q_sort_ext",
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q9", "q_tpch_q10", "q_tpch_q13", "q_tpch_q18", "q_tpch_q21",
    "q_window_rank", "q_sessionize", "q_asof_join",
    "q_word_count", "q_tfidf", "q_time_range_frame", "q_seq_match",
    "q_heavy_hitters", "q_corpus_prep", "q_gap_fill",
    "q_minhash_pairs", "q_ngram_jaccard", "q_knn_bruteforce",
    "q_semantic_dedup", "q_knn_ivf_seeded", "q_lineitem_partitioned",
]


def materialize(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def baseline_anchors() -> dict[str, float]:
    """Per-query anchor seconds parsed from BASELINE.md's anchor tables
    (VERDICT r4 #8: make cross-round drift visible in-round).  An anchor
    row is `| ... \\`q_name\\` ... | <sec> | local[...] ... | ... |` —
    the config cell must contain 'local[' so the re-anchor protocol
    tables (whose cells are old/run1/run2 floats) are never mistaken
    for anchors.  Later rows win, matching the in-place re-anchor
    convention."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    anchors: dict[str, float] = {}
    try:
        with open(os.path.join(here, "BASELINE.md")) as fh:
            for line in fh:
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if len(cells) < 3 or "local[" not in cells[2]:
                    continue
                m = re.search(r"`(q_\w+)`", cells[0])
                if not m:
                    continue
                try:
                    anchors[m.group(1)] = float(cells[1])
                except ValueError:
                    continue
    except OSError:
        pass
    return anchors


def drift_summary(
    timings: dict[str, float], anchors: dict[str, float]
) -> tuple[dict[str, float], dict]:
    """Per-query time/anchor ratios plus the drift roll-up the judge
    reads (count >1.3x / >1.5x / >2x, geomean, worst)."""
    import math

    ratios = {
        n: round(t / anchors[n], 3)
        for n, t in timings.items()
        if n in anchors and anchors[n] > 0
    }
    if not ratios:
        return {}, {"anchored": 0}
    worst = max(ratios, key=ratios.get)
    summary = {
        "anchored": len(ratios),
        "geomean": round(
            math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios)), 3
        ),
        "gt_1_3": sum(r > 1.3 for r in ratios.values()),
        "gt_1_5": sum(r > 1.5 for r in ratios.values()),
        "gt_2": sum(r > 2.0 for r in ratios.values()),
        "max_ratio": ratios[worst],
        "max_query": worst,
    }
    return ratios, summary


def main() -> None:
    spark = get_spark(
        app_name="dbt-lab-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    builders = {q.name: q.build for q in all_queries()}
    builders["q_sort_ext"] = _q_sort_ext
    names = BENCH_NAMES[:5] + ["q_sort_ext"] + BENCH_NAMES[5:]
    # Dev-loop subsetting: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    # queries.  Unset (the driver's invocation) runs the full set.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        names = [n for n in names if n in wanted]

    # SESSION warm-up prefix (r6, lesson (e) in SCALING.md §25): the
    # first ~18 bench positions used to carry 1.2-1.4x inflation from
    # JVM/codegen/Arrow/page-cache cold start that per-query warm-up
    # runs don't absorb because they ARE the cold start.  Four cheap,
    # shape-diverse queries (scan-agg, join, decimal agg, vector UDF)
    # paid once up front take that out of every ledger.
    for wname in ("q_count", "q_group_customers", "q_tpch_q1", "q_knn_bruteforce"):
        if wname in builders:
            try:
                materialize(builders[wname](spark, SF_DIR))
            except Exception:  # a broken warm-up query must not kill the run
                pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        build = builders[name]
        try:
            materialize(build(spark, SF_DIR))  # warm-up (JIT, page cache)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(build(spark, SF_DIR))
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # one broken query must not zero the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(statistics.median(runs), 4)
        print(f"# {name}: {timings[name]:.3f}s (runs: {[round(r,3) for r in runs]})",
              file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "bench_qs_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "master": spark.sparkContext.master,
        "cpus_effective": spark.sparkContext.defaultParallelism,
        "sf": float(sf),
    }
    if errors:
        full["errors"] = errors
    # Per-query baseline ratios + drift roll-up (VERDICT r4 #8): the
    # full ledger carries every ratio; stdout carries the summary.
    ratios, drift = drift_summary(timings, baseline_anchors())
    full["baseline_ratios"] = ratios
    full["drift"] = drift
    # Full per-query ledger -> repo file (survives the driver's stdout
    # tail window; committed per round as BENCH_LOCAL_r{N}.json).
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_LOCAL_latest.json"), "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError as exc:  # read-only checkout must not kill the bench
        print(f"# BENCH_LOCAL_latest.json not written: {exc}", file=sys.stderr)
    # stdout: ONE compact line that fits a 2000-char tail — headline
    # queries only, but the authoritative total/count cover the FULL set.
    head = {n: timings[n] for n in HEADLINE if n in timings}
    out = {
        "metric": "bench_qs_total_wall",
        "value": total,
        "unit": "sec",
        "queries": head,
        "queries_run": len(timings),
        "errors_n": len(errors),
        "drift": drift,
        "detail": "BENCH_LOCAL_latest.json",
        # VERDICT r10 #2a: echo the EFFECTIVE parallelism so the
        # driver's $SPARK_GRAFT_CPUS scaling probe can verify the knob
        # landed (session.py applies it to master AND shuffle
        # partitions; this makes that observable in the output).
        "master": spark.sparkContext.master,
        "cpus_effective": spark.sparkContext.defaultParallelism,
        "sf": float(sf),
    }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:  # hard guarantee: never outgrow the tail window
        out["queries"] = {n: head[n] for n in list(head)[:16]}
        line = json.dumps(out, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
