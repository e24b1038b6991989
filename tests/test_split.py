import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.split import (
    hash_split, leakage_safe_split, split_of, sql_hash_split,
)

SF = "/root/testdata/sf0.001"


def test_split_boundaries():
    assert split_of(0) == "train" and split_of(79) == "train"
    assert split_of(80) == "val" and split_of(89) == "val"
    assert split_of(90) == "test" and split_of(99) == "test"


def test_hash_split_matches_duckdb_and_is_stable():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id"])
    got = (hash_split(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (con.execute(sql_hash_split()).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()
    # deterministic across runs and partitionings
    again = (hash_split(ds.repartition(7)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert got.values.tolist() == again.values.tolist()
    # roughly 80/10/10 (loose bands; the corpus is small)
    frac = got.split.value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.95


def test_salt_changes_assignment():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(200), pa.int64())})
    )
    a = hash_split(ds, salt="v1").to_pandas().sort_values("doc_id")
    b = hash_split(ds, salt="v2").to_pandas().sort_values("doc_id")
    assert (a.bucket.values != b.bucket.values).any()


def test_leakage_safe_clusters_share_split():
    # pairs chain 1-2-3 into one cluster; 10-11 another
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 2, 10], pa.int64()),
                "id_b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(20), pa.int64())})
    )
    got = (
        leakage_safe_split(docs, pairs, num_partitions=2)
        .to_pandas().set_index("doc_id")
    )
    assert got.loc[1].split == got.loc[2].split == got.loc[3].split
    assert got.loc[1].cluster_rep == got.loc[2].cluster_rep == 1
    assert got.loc[10].split == got.loc[11].split
    assert got.loc[10].cluster_rep == got.loc[11].cluster_rep == 10
    # unpaired docs are their own rep, plain hash_split agreement
    plain = hash_split(docs).to_pandas().set_index("doc_id")
    for i in (0, 5, 19):
        assert got.loc[i].split == plain.loc[i].split
