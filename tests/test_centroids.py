"""Per-label embedding centroid components vs hand case and DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.centroids import (
    SQL_LABEL_CENTROIDS, _quantize_ppm, label_centroids,
)

SF = "/root/testdata/sf0.001"


def test_quantize_matches_duckdb_round():
    # half-away-from-zero on both signs, like DuckDB round()
    v = np.array([0.0000005, -0.0000005, 1.25, -1.25, 0.0])
    assert _quantize_ppm(v).tolist() == [1, -1, 1_250_000, -1_250_000, 0]


def test_hand_case():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array([0, 0, 1], pa.int32()),
                "embedding": pa.array(
                    [[1.0, 2.0], [3.0, 4.0], [5.0, -6.0]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(3)
    out = (
        label_centroids(ds)
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    assert out["sum_ppm"].tolist() == [
        4_000_000, 6_000_000, 5_000_000, -6_000_000,
    ]
    assert out["n_vecs"].tolist() == [2, 2, 1, 1]


def test_matches_duckdb():
    got = (
        label_centroids(ray.data.read_parquet(f"{SF}/embeddings.parquet"))
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    exp = con.sql(SQL_LABEL_CENTROIDS).df()
    for c in exp.columns:
        exp[c] = exp[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_partition_invariance():
    t = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    a = (
        label_centroids(t.repartition(1))
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    b = (
        label_centroids(t.repartition(7), num_partitions=3)
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
