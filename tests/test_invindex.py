import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.invindex import (
    build_inverted_index, conjunctive_query, lookup_postings,
    sql_inverted_index,
)

SF = "/root/testdata/sf0.001"


def _small():
    texts = ["the cat sat", "the dog ran", "cat and dog", "the the the", ""]
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(5), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )


def test_index_small_corpus():
    idx = build_inverted_index(_small(), num_partitions=2).to_pandas()
    got = {r.token: list(r.postings) for r in idx.itertuples()}
    assert got["the"] == [0, 1, 3]
    assert got["cat"] == [0, 2]
    assert got["dog"] == [1, 2]
    assert got["and"] == [2]
    df = {r.token: r.df for r in idx.itertuples()}
    assert df["the"] == 3  # distinct docs, not occurrences
    # no duplicate token rows (group completeness across the shuffle)
    assert idx.token.is_unique


def test_index_matches_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = (
        build_inverted_index(ds, num_partitions=4)
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    got["postings"] = got["postings"].map(list)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(sql_inverted_index()).df()
    want["postings"] = want["postings"].map(list)
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def test_max_postings_cap_is_visible():
    idx = build_inverted_index(_small(), num_partitions=2,
                               max_postings=2).to_pandas()
    the = idx[idx.token == "the"].iloc[0]
    assert the.df == 3 and list(the.postings) == [0, 1]  # df keeps truth


def test_lookup_and_conjunctive_query():
    idx = build_inverted_index(_small(), num_partitions=2)
    hits = lookup_postings(idx, ["cat", "dog"])
    assert sorted(hits["token"].to_pylist()) == ["cat", "dog"]
    assert conjunctive_query(idx, ["cat", "dog"]) == [2]
    assert conjunctive_query(idx, ["the", "cat"]) == [0]
    assert conjunctive_query(idx, ["cat", "zebra"]) == []


def test_partition_invariant():
    a = (build_inverted_index(_small(), num_partitions=2)
         .to_pandas().sort_values("token").reset_index(drop=True))
    b = (build_inverted_index(_small().repartition(4), num_partitions=3)
         .to_pandas().sort_values("token").reset_index(drop=True))
    a["postings"] = a["postings"].map(list)
    b["postings"] = b["postings"].map(list)
    assert a.values.tolist() == b.values.tolist()
