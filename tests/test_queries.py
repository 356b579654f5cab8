"""Driver-contract conformance: every SQL-checked ``queries()`` entry must
match its ``oracle_sql()`` DuckDB result (row count + columns +
order-insensitive values) on /root/testdata/sf0.001; rows-only entries must
produce stable, non-erroring output."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
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


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
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
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(entrymod, duck, name):
    ours = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    oracle = _canon(duck.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ours.columns) == list(oracle.columns), (
        f"{name} columns {list(ours.columns)} != {list(oracle.columns)}"
    )
    assert len(ours) == len(oracle), f"{name} rows {len(ours)} != {len(oracle)}"
    pd.testing.assert_frame_equal(ours, oracle, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


ROWS_ONLY = [
    "q53_bpe_merges",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query(entrymod, name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries(entrymod):
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert df is not None
    assert {"subj", "pred", "obj", "score", "doc_id"} <= set(df.columns)
