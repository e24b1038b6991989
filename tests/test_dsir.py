import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.dsir import (
    N_BUCKETS, doc_feature_counts, dsir_score, fit_models, llr_table,
    sql_dsir_score,
)

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_feature_hash_matches_duckdb():
    con = duckdb.connect()
    grams = ["hello", "hello world", "a b", "ünïcode", ""]
    want = [
        con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 8) AS BIGINT) % "
            f"{N_BUCKETS}", [g]
        ).fetchone()[0]
        for g in grams
    ]
    got = []
    import hashlib
    for g in grams:
        got.append(
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
        )
    assert got == want


def test_doc_feature_counts_model():
    c = doc_feature_counts("a b a")
    # unigrams a,b,a + bigrams "a b","b a" -> 5 occurrences
    assert sum(c.values()) == 5
    assert doc_feature_counts("") == {}
    assert doc_feature_counts(None) == {}
    assert sum(doc_feature_counts("solo").values()) == 1  # no bigram


def test_dsir_score_matches_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    got = (
        dsir_score(ds).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        _con().execute(sql_dsir_score()).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def test_llr_table_matches_sql_rounding():
    # the one documented divergence risk: the floor boundary of the
    # feature table — recompute ONLY the llr table in DuckDB and compare
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    tgt, raw = fit_models(ds, "text", "lang", "en")
    eng = llr_table(tgt, raw)
    con = duckdb.connect()
    t_total, r_total = int(tgt.sum()), int(raw.sum())
    df = con.execute(
        f"""
        SELECT CAST(floor(1000000 * (
                 ln(CAST(t + 1 AS DOUBLE)) - ln(CAST(? AS DOUBLE))
               - ln(CAST(r + 1 AS DOUBLE)) + ln(CAST(? AS DOUBLE))
               ) + 0.5) AS BIGINT) AS w
        FROM (SELECT unnest(?) AS t, unnest(?) AS r)
        """,
        [float(t_total + N_BUCKETS), float(r_total + N_BUCKETS),
         tgt.tolist(), raw.tolist()],
    ).df()
    assert (df["w"].to_numpy() == eng).all()


def test_target_docs_score_higher():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    scores = dsir_score(ds).to_pandas()
    langs = (
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "lang"])
        .to_pandas()
    )
    m = scores.merge(langs, on="doc_id")
    m = m[m.n_feats > 0]
    per_feat = m.dsir_score / m.n_feats
    assert per_feat[m.lang == "en"].mean() > per_feat[m.lang != "en"].mean()


def test_partition_invariant():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    a = (dsir_score(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dsir_score(ds.repartition(7)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.values.tolist() == b.values.tolist()


def test_batch_buckets_matches_scalar_reference():
    """_batch_buckets per-doc bucket multiset == doc_feature_counts per
    row, on nulls/empties/unicode/repeats (the vectorized-vs-scalar
    equality the _batch_buckets docstring promises)."""
    from collections import Counter

    from ocr_sam_project_ray.ops.dsir import _batch_buckets

    texts = [
        "the cat sat on the mat the cat", "", None, "   ",
        "uno dos tres", "a", "x y", "emoji \U0001F600 tail \U0001F600 tail",
    ]
    buckets, occ_doc, dl = _batch_buckets(pa.array(texts, pa.string()))
    got = [Counter() for _ in texts]
    for b, d in zip(buckets.tolist(), occ_doc.tolist()):
        got[d][b] += 1
    for i, t in enumerate(texts):
        assert got[i] == doc_feature_counts(t), i
    from ocr_sam_project_ray.ops.textstats import tokenize

    assert dl.tolist() == [len(tokenize(t)) for t in texts]
