"""Driver-contract conformance: every SQL-checked ``queries()`` entry must
match its ``oracle_sql()`` DuckDB result EXACTLY (row count + columns +
order-insensitive values, dtype-kind-sensitive) on /root/testdata/sf0.001
AND sf0.01 — the driver checks at sf0.01 with an exact value hash, so an
int64 engine column vs a float64-rendered oracle column (DuckDB HUGEINT)
is a FAILURE here, as it is there.  Round-3 shipped three red rows
(q42/q44/q52) precisely because the old comparator used
``check_dtype=False, atol=1e-9``; this one would have caught them."""

import numpy as np
import pandas as pd
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    importlib.reload(m)
    return m


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.001", "sf0.01"])
def sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for an EXACT, dtype-kind-sensitive compare.

    Integer widths collapse to int64 and datetimes to int64 epoch-ns, but
    int-vs-float is preserved (that distinction is exactly what the
    driver's value hash sees when DuckDB renders HUGEINT sums as float64).
    Floats are NOT rounded: the repo's float policy already rounds on both
    sides inside the queries/oracles, so surviving values must be
    bit-equal.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_CHECKED = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_topk_orders",
    "q04_distinct_brands", "q05_events_hourly", "q06_filtered_revenue",
    "q07_join_revenue_by_priority", "q08_customers_without_orders",
    "q09_exact_dedup", "q10_token_counts", "q11_quality_stats",
    "q12_ann_topk", "q13_minhash_lsh_groups", "q14_simhash",
    "q15_ngram_jaccard_pairs", "q16_embedding_neardup", "q17_langid",
    "q20_semi_join", "q21_sessions",
    "q22_simhash_pairs", "q23_ngram_jaccard_exact",
    "q24_embedding_cosine_exact", "q25_bpe_tokens", "q26_sliding_windows",
    "q27_asof_join", "q28_gopher_quality", "q29_topk_per_group",
    "q30_median_by_flag", "q31_distinct_suppliers", "q32_pii_scrub",
    "q34_running_totals", "q35_hash_sample", "q18_fingerprints",
    "q33_ivf_full_topk", "q36_vocab_heavy_hitters", "q37_tfidf_topk",
    "q38_line_dedup", "q39_quantiles_by_flag", "q40_inverted_index",
    "q41_kmeans", "q42_bigram_lm", "q43_decontaminate",
    "q44_props_field_stats", "q45_stratified_sample",
    "q46_sequence_packing", "q47_cms_heavy_hitters",
    "q48_bloom_membership", "q49_hll_distinct",
    "q50_mixture_upsample", "q51_pagerank",
    "q52_perplexity_filter", "q54_curation", "q55_semdedup",
    "q56_cdc_substring_dedup", "q57_dsir_weights", "q58_cdc_clean",
    "q59_outer_join", "q60_rollup", "q61_range_join", "q19_ivf_topk",
    "q62_pagerank_dangling", "q63_semdedup_trained",
    "q64_ivf_trained_topk", "q65_triangle_counts",
    "q66_personalized_pagerank", "q67_connected_components",
    "q69_kcore", "q68_source_cap", "q70_bfs_distances",
    "q71_boilerplate_clean", "q72_cube", "q73_dedup_corpus",
    "q74_event_deltas", "q75_set_ops", "q76_funnel", "q77_source_kl",
    "q78_weighted_sample", "q79_bm25_topk", "q80_pmi_collocations",
    "q81_event_pivot", "q82_zipf_slope", "q83_rolling_window",
    "q84_ntile", "q85_token_entropy", "q86_ngram_repetition",
    "q87_grouped_hll", "q88_embedding_moments", "q89_knn_join",
    "q90_incremental_dedup", "q91_fuzzy_name_pairs",
    "q92_time_window_join", "q93_hdr_quantiles", "q94_prefix_jaccard",
    "q95_decayed_sum", "q96_source_overlap", "q97_mad_outliers",
    "q98_user_trend", "q99_new_users_daily", "q100_graph_stats",
    "q101_zscore_normalize", "q102_dense_daily_counts",
    "q103_type_drift", "q104_event_transitions",
    "q105_percent_rank", "q106_retention_cohorts",
    "q107_shuffled_dedup", "q108_curation_v2",
    "q110_itemset_pairs", "q111_skyline", "q112_profile",
    "q113_mode_per_user", "q114_corr_matrix", "q115_melt",
    "q116_sssp", "q117_two_hop_reach", "q118_latest_snapshot",
    "q119_sliding_distinct", "q122_user_paths", "q123_histogram",
    "q124_fk_audit", "q125_hot_keys", "q126_join_size",
    "q127_regional_revenue", "q128_cusum", "q129_containment_pairs",
    "q130_snapshot_diff", "q132_watermark_late",
    "q133_topk_with_ties", "q134_exact_n_sample",
    "q136_vector_quantiles", "q137_pair_lift", "q138_longest_streak",
    "q139_revenue_share", "q140_debounce", "q141_dup_size_histogram",
    "q143_clustering_coefficient", "q146_grouping_sets",
    "q147_interval_coverage", "q148_fuzzy_edit2_pairs",
    "q149_sorted_neighborhood", "q150_temporal_reach",
    "q151_luby_mis", "q152_rendezvous_reshard",
    "q153_weighted_median", "q154_hits", "q155_link_prediction",
    "q156_rrf_hybrid", "q157_scd2_intervals", "q158_locf_daily",
    "q159_snake_shards", "q160_winsorized_stats", "q161_gini_skew",
    "q162_vocab_churn", "q163_equi_depth_histogram",
    "q164_boilerplate_attribution", "q165_topn_other",
    "q166_boolean_and", "q167_max_rate_60s", "q168_peak_concurrency",
    "q169_hhi_concentration", "q170_loo_mean", "q171_table_checksum",
    "q172_auc_rank_sum", "q173_last_touch_attribution",
    "q174_chi2_keywords", "q175_class_scatter",
    "q176_calibration_deciles", "q177_split_assignment",
    "q178_er_clusters", "q179_zorder_layout", "q180_scc",
    "q181_merge_upsert", "q182_ks_drift", "q183_ohlc_bars",
    "q184_k_anonymity", "q185_group_split_audit",
    "q186_lorenz_deciles", "q187_widest_path", "q188_recall_at_k",
    "q189_mixture_allocation", "q190_curation_attrition",
    "q191_hierarchical_shares", "q192_sequence_compressibility",
    "q194_time_travel", "q195_fd_violations", "q196_benford_audit",
    "q197_l_diversity", "q198_cascade_delete",
    "q199_embedding_decontaminate", "q200_smb_join_revenue",
    "q203_cluster_pair_eval", "q204_missing_partitions",
    "q205_incremental_view_merge", "q206_rag_chunks",
    "q207_mixture_interleave", "q209_contract_violations",
    "q210_partitioned_sink_audit", "q211_semantic_boundaries",
    "q212_token_budget_plan", "q213_global_row_number",
    "q215_drop_reasons", "q216_training_shards",
    "q217_winnowing", "q218_cosine_histogram",
    "q219_mutual_information", "q220_linear_interpolate",
    "q221_ngram_novelty", "q222_bootstrap_ci",
    "q223_hll_intersection", "q224_fd_impute",
    "q225_random_walks", "q226_skipgram_pairs",
    "q229_moss_pairs", "q230_oov_rate",
    "q231_label_propagation", "q232_power_iteration",
    "q233_compaction_plan", "q235_community_stats",
    "q236_degree_assortativity", "q237_cc_pointer_doubling",
    "q238_best_rep_dedup", "q239_padding_plan",
    "q240_prefix_cache_groups", "q241_doremi_weights",
    "q242_source_dedup_attrition", "q243_cross_source_dups",
    "q244_join_order_plan",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(entrymod, duck, sf_dir, name):
    ours = _canon(_to_pandas(entrymod.queries()[name](sf_dir)))
    oracle = _canon(duck.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ours.columns) == list(oracle.columns), (
        f"{name} columns {list(ours.columns)} != {list(oracle.columns)}"
    )
    assert len(ours) == len(oracle), f"{name} rows {len(ours)} != {len(oracle)}"
    for c in ours.columns:
        ok, oc = ours[c].dtype.kind, oracle[c].dtype.kind
        assert ok == oc, (
            f"{name}.{c} dtype kind {ours[c].dtype} != oracle {oracle[c].dtype}"
            " (driver hash is dtype-sensitive — CAST the oracle aggregate)"
        )
    pd.testing.assert_frame_equal(ours, oracle, check_dtype=False,
                                  check_exact=True)


ROWS_ONLY = [
    "q53_bpe_merges",
    "q109_bpe_encode",
    "q120_pq_encode",
    "q121_pq_topk",
    "q131_mmr_select",
    "q135_media_pipeline",
    "q142_image_neardup",
    "q144_audio_neardup",
    "q145_video_neardup",
    "q193_msf",
    "q201_unigram_lm",
    "q202_media_header_audit",
    "q208_maximal_matching",
    "q214_ivfpq_topk",
    "q227_tokenizer_fertility",
    "q228_graph_coloring",
    "q234_quality_classifier",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query(entrymod, sf_dir, name):
    df = _to_pandas(entrymod.queries()[name](sf_dir))
    assert df is not None
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries(entrymod):
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q


def test_driver_window_covers_critical_queries(entrymod):
    """The driver's correctness sweep checks the FIRST 50 queries()
    entries (dict order).  Round-5 rotation: every entry already green in
    an earlier sweep (r1-r4) moved to the tail; the window now holds
    SQL-checked entries that have never had a driver row — composition
    flagships, heavy-machinery operators, and the round-4 tail additions.
    Pin them so a future reorder can't silently push them back off the
    scoreboard, and require every window entry to be SQL-checked
    (rows-only entries gain nothing from the window)."""
    first50 = list(entrymod.queries())[:50]
    must = {
        # composition flagships
        "q215_drop_reasons", "q216_training_shards",
        "q200_smb_join_revenue", "q213_global_row_number",
        "q205_incremental_view_merge", "q194_time_travel",
        "q190_curation_attrition",
        # heavy-machinery operators
        "q110_itemset_pairs", "q116_sssp", "q129_containment_pairs",
        "q148_fuzzy_edit2_pairs", "q149_sorted_neighborhood",
        "q151_luby_mis", "q157_scd2_intervals", "q180_scc",
        "q187_widest_path",
        # round-4 tail additions
        "q217_winnowing", "q229_moss_pairs", "q225_random_walks",
        "q226_skipgram_pairs", "q222_bootstrap_ci",
        "q223_hll_intersection",
        # round-5 composition flagships
        "q238_best_rep_dedup", "q241_doremi_weights",
        "q242_source_dedup_attrition",
    }
    missing = must - set(first50)
    assert not missing, f"critical queries outside driver window: {missing}"
    not_sql = set(first50) - set(entrymod.oracle_sql())
    assert not not_sql, f"rows-only entries wasting window slots: {not_sql}"


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert df is not None
    assert {"subj", "pred", "obj", "score", "doc_id"} <= set(df.columns)


def test_queries_oracle_contract(entrymod):
    """Every oracle key has a queries() entry, and the rows-only set
    (no SQL twin, weaker driver check) stays pinned to the model/KG
    family — a new query accidentally shipped without its oracle fails
    here, not on the driver's scoreboard."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    rows_only = q - o
    assert rows_only == {
        "kg_doc_ner_stats", "kg_edges", "kg_extract_text", "kg_nodes",
        "kg_triples", "kg_triples_hoffmann", "kg_triples_mimlre",
        "q53_bpe_merges", "q109_bpe_encode", "q120_pq_encode",
        "q121_pq_topk", "q131_mmr_select", "q135_media_pipeline",
        "q142_image_neardup", "q144_audio_neardup",
        "q145_video_neardup", "q193_msf", "q201_unigram_lm",
        "q202_media_header_audit", "q208_maximal_matching",
        "q214_ivfpq_topk", "q227_tokenizer_fertility",
        "q228_graph_coloring", "q234_quality_classifier",
    }, f"unexpected rows-only queries: {sorted(rows_only)}"


def test_sql_checked_covers_every_oracle(entrymod):
    """SQL_CHECKED (the conformance matrix above) must list every
    oracle-backed query — adding an oracle without its exact
    conformance test fails here."""
    o = set(entrymod.oracle_sql())
    missing = o - set(SQL_CHECKED)
    assert not missing, f"oracle queries missing from SQL_CHECKED: {sorted(missing)}"
