import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.snapshot_diff import (
    snapshot_diff, sql_snapshot_diff,
)

SF = "/root/testdata/sf0.001"


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_all_four_statuses():
    old = ray.data.from_arrow(_tbl([(1, "a"), (2, "b"), (3, "c")]))
    new = ray.data.from_arrow(_tbl([(2, "b"), (3, "c2"), (4, "d")]))
    got = (
        snapshot_diff(old, new, num_partitions=2)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert got.loc[1].status == "removed"
    assert got.loc[2].status == "unchanged"
    assert got.loc[3].status == "changed"
    assert got.loc[4].status == "added"
    assert bool(got.loc[1].in_old) and not bool(got.loc[1].in_new)
    assert bool(got.loc[4].in_new) and not bool(got.loc[4].in_old)


def test_matches_duckdb_oracle_on_corpus_slices():
    # old = doc_id % 3 != 0; new = doc_id % 4 != 0, with text edited for
    # doc_id % 5 == 0 (deterministic decoration, both sides)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])

    def edit(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        mask = pa.array(ids % 5 == 0)
        edited = pc.if_else(
            mask,
            pc.binary_join_element_wise(
                pc.cast(batch["text"], pa.string()), " v2", ""),
            batch["text"],
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", edited)

    old = docs.filter(
        lambda r: r["doc_id"] % 3 != 0)
    new = docs.filter(
        lambda r: r["doc_id"] % 4 != 0).map_batches(
        edit, batch_format="pyarrow")

    got = (
        snapshot_diff(old, new, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    old_sql = "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0"
    new_sql = (
        "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' v2' "
        "ELSE text END AS text FROM documents WHERE doc_id % 4 <> 0"
    )
    want = (
        con.execute(sql_snapshot_diff(old_sql, new_sql)).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()
    assert set(got.status) == {"added", "removed", "changed", "unchanged"}


def test_partition_invariant():
    old = ray.data.from_arrow(_tbl([(i, f"t{i}") for i in range(40)]))
    new = ray.data.from_arrow(
        _tbl([(i, f"t{i}" if i % 4 else "edited") for i in range(5, 45)]))
    a = (snapshot_diff(old, new, num_partitions=2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (snapshot_diff(old.repartition(7), new.repartition(3),
                       num_partitions=5)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.values.tolist() == b.values.tolist()
