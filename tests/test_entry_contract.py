"""Driver-contract conformance: every queries() entry runs at sf0.001 and
matches its oracle_sql() under the driver's comparison shape (sorted
columns, order-insensitive values). oracle_sql() golden paths target
sf0.01 by contract, so oracles here are re-rendered for sf0.001 where they
reference golden parquet; view-based oracles run as-is."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for v in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        c.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{SF}/{v}.parquet')")
    return c


@pytest.fixture(scope="module")
def oracles_001(entry_mod):
    """oracle_sql() with golden paths re-rendered for sf0.001."""
    from ocr_sam_project_ray.sources.synthetic import corpus_paths, ensure_corpus

    ensure_corpus(SF)
    p01 = corpus_paths("/root/testdata/sf0.01")
    p001 = corpus_paths(SF)
    out = {}
    for name, sql in entry_mod.oracle_sql().items():
        for key in ("pages", "golden_pages", "golden_segments", "golden_entities"):
            sql = sql.replace(p01[key], p001[key])
        out[name] = sql
    return out


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    assert ds.count() > 0
    assert "extracted_text" in ds.schema().names


def test_every_query_has_callable_and_runs(entry_mod, con, oracles_001):
    qs = entry_mod.queries()
    assert len(qs) >= 25
    failures = []
    for name, fn in qs.items():
        got = fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        assert len(got.columns) > 0, name
        sql = oracles_001.get(name)
        if sql is None:
            continue  # rows-only contract
        exp = con.sql(sql).df()
        g, e = _normalize(got), _normalize(exp)
        if list(g.columns) != list(e.columns) or not g.equals(e):
            failures.append(name)
    assert failures == []


# The external driver snapshots EXACTLY the first 50 queries() entries
# (observed at r01–r03); rotations into/out of that window must be
# deliberate. This pin makes an accidental reorder (or an insertion that
# silently shifts the window) fail a test instead of silently changing
# what the driver records.
RECORDED_50 = [
    "extract_main_text", "extract_validate", "extract_segments", "extract_classify", "extract_entities",
    "extract_montos", "extract_metadata", "extract_spans_agg", "extract_fecha_iso", "project_names",
    "text_scores", "accepted_results", "dedup_pages", "batch_rollup", "crawl_frontier",
    "token_df", "events_cumsum", "bpe_encode_docs", "knn_quantized", "pack_documents",
    "text_lang_id", "doc_fingerprint", "dedup_docs_exact", "dedup_docs_norm", "ngram_jaccard_pairs",
    "near_dup_verified", "near_dup_clusters", "dedup_docs_near_verified", "line_dedup", "pii_redact",
    "multimodal_meta", "knn_cosine", "cosine_near_pairs", "doc_embeddings", "trigram_lm_score",
    "dsir_score", "bm25_topk", "tfidf_topk", "host_pagerank", "events_funnel",
    "doc_split_safe", "q1_pricing", "q3_top_orders", "phrase_search", "events_asof_orders",
    "quality_gopher", "dedup_incremental", "knn_from_text", "hybrid_rrf", "fix_mojibake",
]


def test_recorded_window_boundary(entry_mod):
    keys = list(entry_mod.queries())
    assert keys[:50] == RECORDED_50, (
        "the driver-recorded 50-query window shifted — if this rotation "
        "is deliberate, update RECORDED_50 (and the registry marker "
        "comment in __ray_entry__.queries())"
    )
    # every recorded query must be oracle-checked (the driver's hash gate)
    oracles = entry_mod.oracle_sql()
    missing = [k for k in RECORDED_50 if k not in oracles]
    assert not missing, f"recorded-window queries without oracles: {missing}"
