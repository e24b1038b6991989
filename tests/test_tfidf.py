"""Per-document tf-idf top-k: engine↔SQL parity on both plans, rank
determinism (score DESC, token ASC ties), linear-idf single-division
float contract, edge cases (empty/NULL text, k > vocabulary)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.tfidf import sql_tfidf_topk, tfidf_topk


def _docs() -> pa.Table:
    rows = [
        (0, "apple banana apple cherry banana apple"),
        (1, "banana cherry durian durian cherry"),
        (2, "apple unique1 unique2 unique3"),
        # tie construction: tf=2,df=4 vs tf=1,df=2 score equally (linear
        # idf) — rank must fall back to token ASC
        (3, "zz zz common rare"),
        (4, "common rare zz"),
        (5, "common zz"),
        (6, "common zz rare rare"),
        (7, ""),
        (8, None),
        (9, "solo"),
    ]
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )


def _oracle(tbl: pa.Table, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql_tfidf_topk(k)).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df["score"] = df["score"].astype(float)
    return df.sort_values(["doc_id", "rank"]).reset_index(drop=True)


@pytest.mark.parametrize("plan", ["broadcast", "distributed"])
@pytest.mark.parametrize("k", [1, 3, 50])
def test_matches_sql_oracle(plan, k):
    tbl = _docs()
    got = tfidf_topk(
        ray.data.from_arrow(tbl), k=k, num_partitions=3, plan=plan
    ).to_pandas()
    exp = _oracle(tbl, k)
    g, e = _norm(got), _norm(exp)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_plans_agree():
    tbl = _docs()
    a = _norm(tfidf_topk(ray.data.from_arrow(tbl), k=4, num_partitions=3,
                         plan="broadcast").to_pandas())
    b = _norm(tfidf_topk(ray.data.from_arrow(tbl), k=4, num_partitions=3,
                         plan="distributed").to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rank_and_tie_semantics():
    tbl = _docs()
    got = tfidf_topk(ray.data.from_arrow(tbl), k=10, num_partitions=2,
                     plan="broadcast").to_pandas()
    d0 = got[got.doc_id == 0].sort_values("rank")
    # doc 0: apple tf=3 df=2 > banana tf=2 df=2 > cherry tf=1 df=3
    assert list(d0.token) == ["apple", "banana", "cherry"]
    assert list(d0["rank"]) == [1, 2, 3]
    # scores strictly non-increasing within every doc
    for _, grp in got.groupby("doc_id"):
        s = grp.sort_values("rank")["score"].to_numpy()
        assert (s[:-1] >= s[1:]).all()
    # token-less docs emit no rows
    assert not set(got.doc_id) & {7, 8}


def test_score_is_exact_rational():
    tbl = _docs()
    got = tfidf_topk(ray.data.from_arrow(tbl), k=10, num_partitions=2,
                     plan="broadcast").to_pandas()
    n = tbl.num_rows
    for r in got.itertuples():
        assert r.score == (r.tf * n) / r.df


def test_partition_invariance():
    tbl = _docs()
    a = _norm(tfidf_topk(ray.data.from_arrow(tbl).repartition(1), k=3,
                         num_partitions=2).to_pandas())
    b = _norm(tfidf_topk(ray.data.from_arrow(tbl).repartition(7), k=3,
                         num_partitions=5).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
