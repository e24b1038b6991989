"""Cross-snapshot incremental dedup: exactness, bloom on/off equality,
edge cases, and the sf-corpus split used by the driver oracle."""

import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.incremental import dedup_against_snapshot


def _ds(rows: dict[int, str]):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(rows), "text": list(rows.values())})
    )


def test_exact_semantics():
    snapshot = _ds({100: "alpha", 101: "beta", 102: "gamma"})
    new = _ds({0: "alpha", 1: "delta", 2: "beta", 3: "epsilon"})
    for use_bloom in (True, False):
        got = dedup_against_snapshot(
            new, snapshot, num_partitions=2, use_bloom=use_bloom
        ).to_pandas()
        assert sorted(got.doc_id.tolist()) == [1, 3], use_bloom
        assert sorted(got.text.tolist()) == ["delta", "epsilon"]


def test_empty_snapshot_keeps_all():
    snapshot = _ds({})
    new = _ds({0: "a", 1: "b"})
    got = dedup_against_snapshot(new, snapshot, num_partitions=2).to_pandas()
    assert sorted(got.doc_id.tolist()) == [0, 1]


def test_all_duplicate():
    snapshot = _ds({10: "x", 11: "y"})
    new = _ds({0: "x", 1: "y"})
    got = dedup_against_snapshot(new, snapshot, num_partitions=2).to_pandas()
    assert got.empty


def test_anti_join_path_matches_broadcast_path():
    snapshot = _ds({i + 1000: f"t{i}" for i in range(50)})
    new = _ds({i: f"t{i}" if i % 2 == 0 else f"n{i}" for i in range(100)})
    a = dedup_against_snapshot(
        new, snapshot, num_partitions=2, broadcast_max=5_000_000
    ).to_pandas()
    b = dedup_against_snapshot(
        new, snapshot, num_partitions=2, broadcast_max=1  # force anti-join
    ).to_pandas()
    assert sorted(a.doc_id.tolist()) == sorted(b.doc_id.tolist())
    assert sorted(a.doc_id.tolist()) == [i for i in range(100) if i % 2 or i >= 50]


def test_matches_duckdb_on_corpus(sf_dir="/root/testdata/sf0.001"):
    import duckdb

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    import numpy as np

    def split(rem_keep):
        def f(b):
            ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            return b.filter(pa.array((ids % 3 == 0) == rem_keep))
        return f

    snapshot = docs.map_batches(split(True), batch_format="pyarrow")
    new = docs.map_batches(split(False), batch_format="pyarrow")
    got = sorted(
        dedup_against_snapshot(new, snapshot, num_partitions=4)
        .select_columns(["doc_id"]).to_pandas().doc_id.tolist()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.sql(
        """
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id % 3 <> 0
          AND NOT EXISTS (SELECT 1 FROM documents s
                          WHERE s.doc_id % 3 = 0 AND s.text = d.text)
        ORDER BY d.doc_id
        """
    ).df().doc_id.tolist()
    assert got == exp  # exactness is the contract; planted-dup coverage is
    # in the synthetic tests above (sf0.001 has no cross-split exact dups)


def test_huge_int64_ids_survive_exactly():
    # ids >= 2^53 are NOT representable in float64: the semi-join must
    # keep the id column on the Arrow side (a numpy round-trip through
    # float64 would silently corrupt them)
    base = 2 ** 53
    snapshot = _ds({base + 100: "alpha", base + 101: "beta"})
    new = _ds({base + 1: "alpha", base + 3: "delta", base + 5: "beta"})
    for use_bloom in (True, False):
        got = dedup_against_snapshot(
            new, snapshot, num_partitions=2, use_bloom=use_bloom
        ).to_pandas()
        assert sorted(got.doc_id.tolist()) == [base + 3], use_bloom
    # force the shuffled anti-join apply path too
    got = dedup_against_snapshot(
        new, snapshot, num_partitions=2, broadcast_max=0
    ).to_pandas()
    assert sorted(got.doc_id.tolist()) == [base + 3]
