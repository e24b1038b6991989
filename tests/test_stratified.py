"""Exact stratified sampling: per-stratum quota exactness (vs the
binomial drift of hash-threshold sampling), engine↔SQL parity, integer
ceil semantics, determinism across partitionings."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.stratified import (
    sql_stratified_sample,
    stratified_sample,
)


def _docs(n=60) -> pa.Table:
    langs = ["es", "en", "pt"]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
            "text": pa.array(
                [f"documento numero {i} contenido unico" for i in range(n)],
                pa.string(),
            ),
        }
    )


def _oracle(tbl: pa.Table, num: int, den: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql_stratified_sample(num, den)).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)].sort_values("doc_id")
            .reset_index(drop=True))


@pytest.mark.parametrize("num,den", [(1, 4), (3, 10), (1, 1), (0, 1), (2, 3)])
def test_matches_sql_oracle(num, den):
    tbl = _docs()
    got = stratified_sample(
        ray.data.from_arrow(tbl), num, den, num_partitions=3
    ).to_pandas()
    exp = _oracle(tbl, num, den)
    if num == 0:
        # all-empty group outputs lose the pandas column index in Ray's
        # to_pandas; the zero-quota contract is simply "no rows"
        assert len(got) == 0 and len(exp) == 0
        return
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_quota_is_exact_per_stratum():
    tbl = _docs(61)  # uneven strata: 21/20/20
    got = stratified_sample(
        ray.data.from_arrow(tbl), 3, 10, num_partitions=2
    ).to_pandas()
    sizes = pd.Series([21, 20, 20], index=["es", "en", "pt"])
    kept = got.groupby("stratum").size()
    for s, n in sizes.items():
        assert kept[s] == math.ceil(n * 3 / 10)


def test_rank_within_quota():
    got = stratified_sample(
        ray.data.from_arrow(_docs()), 1, 4, num_partitions=2
    ).to_pandas()
    for _, grp in got.groupby("stratum"):
        ranks = sorted(grp.stratum_rank)
        assert ranks == list(range(1, len(ranks) + 1))


def test_partition_invariance():
    tbl = _docs(97)
    a = stratified_sample(
        ray.data.from_arrow(tbl).repartition(1), 2, 5, num_partitions=1
    ).to_pandas()
    b = stratified_sample(
        ray.data.from_arrow(tbl).repartition(8), 2, 5, num_partitions=5
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)


def test_bad_fraction_rejected():
    with pytest.raises(ValueError):
        stratified_sample(ray.data.from_arrow(_docs()), 1, 0)
