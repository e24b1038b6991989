"""BM25 top-k: engine↔SQL parity (integer-rational contract), rank
determinism, edge cases; reciprocal-rank fusion algebra."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.bm25 import (
    bm25_topk,
    rrf_fuse,
    sql_bm25_topk,
)

QUERIES = ["apple banana", "cherry", "rare zz zz", "absentterm"]


def _docs() -> pa.Table:
    rows = [
        (0, "apple banana apple cherry banana apple"),
        (1, "banana cherry durian durian cherry"),
        (2, "apple unique1 unique2 unique3"),
        (3, "zz zz common rare"),
        (4, "common rare zz"),
        (5, "common zz"),
        (6, "common zz rare rare"),
        (7, ""),
        (8, None),
        (9, "solo"),
        (10, "apple " * 50),          # long doc: length normalization bites
        (11, "banana"),               # short doc: tf=1 but tiny dl
    ]
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )


def _oracle(tbl: pa.Table, queries, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql_bm25_topk(queries, k=k)).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .astype({"qid": "int64", "doc_id": "int64",
                 "rank": "int64", "score_ppm": "int64"})
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("k", [1, 3, 50])
def test_matches_sql_oracle(k):
    tbl = _docs()
    got = bm25_topk(ray.data.from_arrow(tbl), QUERIES, k=k).to_pandas()
    exp = _oracle(tbl, QUERIES, k)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_shape_and_semantics():
    tbl = _docs()
    got = bm25_topk(ray.data.from_arrow(tbl), QUERIES, k=10).to_pandas()
    # a query whose terms miss the corpus entirely returns no rows
    assert not (got.qid == 3).any()
    # docs without any query term never appear
    assert not got.doc_id.isin([2 + 7, 8, 9]).any()  # 9='solo', 7/8 empty
    # ranks are 1..n dense per query
    for _, g in got.groupby("qid"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
    # length normalization: doc 11 ("banana", dl=1) must outrank the
    # banana-heavy-but-long doc 0 is NOT required, but doc 10 (50x
    # "apple") must not dominate purely on raw tf — saturation caps it:
    q0 = got[got.qid == 0].set_index("doc_id")
    assert q0.loc[0, "rank"] == 1  # tf on both terms beats single-term spam


def test_rrf_fusion_matches_sql():
    a = pa.table({
        "qid": pa.array([0, 0, 0, 1], pa.int64()),
        "doc_id": pa.array([10, 11, 12, 10], pa.int64()),
        "rank": pa.array([1, 2, 3, 1], pa.int64()),
    })
    b = pa.table({
        "qid": pa.array([0, 0, 1], pa.int64()),
        "doc_id": pa.array([12, 13, 99], pa.int64()),
        "rank": pa.array([1, 2, 1], pa.int64()),
    })
    got = rrf_fuse([a, b], k=10).to_pandas()
    con = duckdb.connect()
    con.register("ra", a)
    con.register("rb", b)
    exp = con.execute("""
        WITH u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
        f AS (
          SELECT qid, doc_id,
                 CAST(SUM(CAST(FLOOR(1000000000.0 / (60 + rank) + 0.5)
                               AS BIGINT)) AS BIGINT) AS rrf_score
          FROM u GROUP BY qid, doc_id
        )
        SELECT qid, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY qid ORDER BY rrf_score DESC, doc_id
               ) AS BIGINT) AS rank, rrf_score
        FROM f ORDER BY qid, rank
    """).df()
    pd.testing.assert_frame_equal(
        _norm_rrf(got), _norm_rrf(exp), check_dtype=False
    )
    # doc 12 appears in both systems for qid 0 -> its fused score is the
    # sum of both contributions and it must win
    assert got[(got.qid == 0) & (got["rank"] == 1)].doc_id.iloc[0] == 12


def _norm_rrf(df):
    return (
        df[sorted(df.columns)]
        .astype("int64")
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )


def test_parity_bound_guard():
    from ocr_sam_project_ray.ops.bm25 import _contribution

    with pytest.raises(ValueError, match="2\\^53"):
        _contribution(tf=2**20, df=1, dl=2**20, n=2**20, t=2**40)


def test_bm25_no_match_returns_typed_empty():
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
    }))
    t = bm25_topk(ds, ["zzz qqq"], k=5)
    assert t.num_rows == 0
    assert t.column_names == ["qid", "doc_id", "rank", "score_ppm"]
    assert t.schema.field("score_ppm").type == pa.int64()


def test_sql_bm25_escapes_quotes():
    sql = sql_bm25_topk(["o'brien's term"], k=3)
    # every literal quote inside the VALUES list must be doubled
    assert "'o''brien''s'" in sql
    import duckdb
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["o'brien's term here"], pa.string()),
    }))
    rows = con.execute(sql).fetchall()  # must parse and run
    assert rows and rows[0][1] == 1


def test_contrib_matrix_equals_scalar():
    """The vectorized batch kernel must be bit-identical to the scalar
    left-associative reference for every cell."""
    import numpy as np

    from ocr_sam_project_ray.ops.bm25 import _contrib_matrix, _contribution

    rng = np.random.default_rng(7)
    n_docs, n_terms = 23, 5
    tf = rng.integers(0, 6, size=(n_docs, n_terms)).astype(np.int64)
    dl = rng.integers(1, 400, size=n_docs).astype(np.int64)
    n, t = 5000, 800_000
    dfs = rng.integers(1, n, size=n_terms)
    idf = (2 * (n - dfs) + 1) / (2 * dfs + 1)
    c = _contrib_matrix(tf, dl, idf, n, t)
    for i in range(n_docs):
        for j in range(n_terms):
            exp = (
                _contribution(int(tf[i, j]), int(dfs[j]), int(dl[i]), n, t)
                if tf[i, j] > 0 else 0
            )
            assert c[i, j] == exp


def test_float_scoring_matches_reference_impl():
    """Engine float path vs a driver-side pure-numpy recompute of the
    log-idf Okapi contract (k1=3/2, b=3/4, Lucene non-negative idf).
    Float scores aren't cross-engine hash-checkable — this pins the
    engine's own kernel against an independent rendering instead."""
    import math

    import numpy as np

    from ocr_sam_project_ray.ops.textstats import tokenize

    tbl = _docs()
    got = bm25_topk(
        ray.data.from_arrow(tbl), QUERIES, k=50, scoring="float"
    ).to_pandas()
    texts = [t if t is not None else "" for t in tbl["text"].to_pylist()]
    toks = [tokenize(t) for t in texts]
    n = len(texts)
    tt = sum(len(t) for t in toks)
    avgdl = tt / n
    k1, b = 1.5, 0.75
    for _, row in got.iterrows():
        qterms = sorted(set(tokenize(QUERIES[int(row.qid)])))
        dtoks = toks[int(row.doc_id)]
        dl = len(dtoks)
        exp = 0.0
        for term in qterms:
            tf = dtoks.count(term)
            if tf == 0:
                continue
            df = sum(1 for d in toks if term in d)
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            exp += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        assert np.isclose(row.score, exp, rtol=1e-12), (row, exp)


def test_auto_switches_to_float_past_parity_bound():
    """scoring='auto' with a shrunken parity bound (stand-in for a
    10^13-token corpus) must flip to the float contract — schema says
    'score' float64 — and produce exactly the forced-float result; the
    top-k DOC SETS must still overlap the rational contract's heavily
    (the two idf surrogates are monotone in df, so rankings agree up to
    near-ties)."""
    tbl = _docs()
    ds = ray.data.from_arrow(tbl)
    auto = bm25_topk(ds, QUERIES, k=5, _parity_bound=10)
    assert auto.column_names == ["qid", "doc_id", "rank", "score"]
    assert auto.schema.field("score").type == pa.float64()
    forced = bm25_topk(ds, QUERIES, k=5, scoring="float")
    pd.testing.assert_frame_equal(auto.to_pandas(), forced.to_pandas())
    rat = bm25_topk(ds, QUERIES, k=5, scoring="rational").to_pandas()
    flt = auto.to_pandas()
    for qid in sorted(set(rat.qid)):
        rs = set(rat[rat.qid == qid].doc_id)
        fs = set(flt[flt.qid == qid].doc_id)
        assert len(rs & fs) >= 0.8 * len(rs), (qid, rs, fs)
    # a query matching nothing stays absent under both contracts
    assert not (flt.qid == 3).any()


def test_float_no_match_returns_typed_empty():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
    }))
    t = bm25_topk(ds, ["zzz qqq"], k=5, scoring="float")
    assert t.num_rows == 0
    assert t.column_names == ["qid", "doc_id", "rank", "score"]
    assert t.schema.field("score").type == pa.float64()


def test_rational_parity_precheck():
    """Driver-side pre-check: safe at small-corpus numbers, trips at
    the 100 TB token regime (T ~ 1e13) without any worker involvement."""
    from ocr_sam_project_ray.ops.bm25 import (
        _PARITY_BOUND,
        _rational_parity_ok,
    )

    assert _rational_parity_ok(10**6, 10**9, 10**4, 8, _PARITY_BOUND)
    assert not _rational_parity_ok(10**10, 10**13, 10**5, 8, _PARITY_BOUND)
    # empty corpus is trivially safe
    assert _rational_parity_ok(0, 0, 0, 8, _PARITY_BOUND)


def test_unknown_scoring_rejected():
    ds = ray.data.from_arrow(_docs())
    with pytest.raises(ValueError, match="scoring"):
        bm25_topk(ds, QUERIES, k=3, scoring="fancy")


def test_contrib_matrix_parity_guard():
    import numpy as np
    import pytest as _pt

    from ocr_sam_project_ray.ops.bm25 import _contrib_matrix

    tf = np.array([[10**9]], dtype=np.int64)
    dl = np.array([10**9], dtype=np.int64)
    with _pt.raises(ValueError, match="2\\^53"):
        _contrib_matrix(tf, dl, np.array([1.0]), 10**9, 10**9)
