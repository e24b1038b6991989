import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.pmi import pmi_topk, sql_pmi_topk

SF = "/root/testdata/sf0.001"


def test_pmi_matches_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = pmi_topk(ds, k=30, num_partitions=4).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(sql_pmi_topk(k=30)).df()
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def test_pmi_prefers_exclusive_pairs():
    # "alpha beta" always co-occur exclusively; "the x" pairs share "the"
    texts = (["alpha beta"] * 6
             + ["the cat", "the dog", "the cow", "the cat",
                "the dog", "the cat"])
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )
    top = pmi_topk(ds, k=5, min_count=3).to_pandas()
    assert top.iloc[0].gram == "alpha beta"
    # exclusive pair: c_xy == c_x == c_y
    assert top.iloc[0].c_xy == top.iloc[0].c_x == top.iloc[0].c_y == 6


def test_min_count_threshold():
    texts = ["rare pair", "x y x y x y x y x y"]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(2), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )
    top = pmi_topk(ds, k=10, min_count=2).to_pandas()
    assert "rare pair" not in set(top.gram)
    assert {"x y", "y x"} <= set(top.gram)


def test_partition_invariant():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    a = pmi_topk(ds, k=20, num_partitions=4).to_pandas()
    b = pmi_topk(ds.repartition(7), k=20, num_partitions=2).to_pandas()
    assert a.values.tolist() == b.values.tolist()
