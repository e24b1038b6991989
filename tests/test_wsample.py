"""Weighted bottom-k sampling: DuckDB parity, partition invariance,
weight monotonicity, and the local-prune correctness argument."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.wsample import (
    _priority,
    sql_weighted_sample,
    weighted_sample,
)


def _table(n=200, seed=7):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 12)))
             for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def test_duckdb_parity():
    t = _table()
    got = (weighted_sample(ray.data.from_arrow(t), 25).to_pandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.sql(sql_weighted_sample(25)).df()
    assert got[["doc_id", "weight", "priority"]].astype("int64").equals(
        exp.astype("int64"))


def test_partition_invariance():
    t = _table()
    a = weighted_sample(
        ray.data.from_arrow(t).repartition(1), 20).to_pandas()
    b = weighted_sample(
        ray.data.from_arrow(t).repartition(13), 20).to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)


def test_local_prune_equals_no_prune():
    # k larger than any block: prune path vs passthrough path agree
    t = _table(n=30)
    full = weighted_sample(ray.data.from_arrow(t).repartition(10), 30
                           ).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.sql(sql_weighted_sample(30)).df()
    assert sorted(full.doc_id) == sorted(exp.doc_id)


def test_weight_monotone_inclusion():
    # same text, one row much heavier -> heavier row has strictly
    # smaller priority and wins the k=1 slot among equals
    texts = ["same text"] * 4
    w = np.array([1, 1, 1, 1000], dtype=np.int64)
    prio = _priority(texts, w)
    assert prio[3] < prio[0]
    assert prio[0] == prio[1] == prio[2]


def test_zero_weight_clamped():
    prio = _priority(["x"], np.array([0], dtype=np.int64))
    assert prio[0] == _priority(["x"], np.array([1], dtype=np.int64))[0]


def test_k_validation():
    with pytest.raises(ValueError):
        weighted_sample(ray.data.from_arrow(_table(5)), 0)


def test_tied_priorities_keep_lowest_ids():
    # identical text + equal weight -> identical priority; the local
    # prune must cut by (priority, id), not priority alone, or a
    # higher-id tied row can displace a lower-id one at the k boundary
    n = 40
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["same text here"] * n, pa.string()),
        "n_chars": pa.array([14] * n, pa.int64()),
    })
    got = weighted_sample(ray.data.from_arrow(t).repartition(1), 5
                          ).to_pandas()
    assert got.doc_id.tolist() == [0, 1, 2, 3, 4]
    assert got.priority.nunique() == 1
