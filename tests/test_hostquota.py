"""Per-host quota: exact keep set vs a DuckDB window recompute, hot-host
skew behavior (cap far below host size), determinism across input
partitionings, and rank contiguity."""

import duckdb
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.hostquota import SQL_HOST_QUOTA, host_quota


def _urls(n_hosts=5, per_host=40):
    return [
        f"https://h{h}.example/p/{i:04d}"
        for h in range(n_hosts) for i in range(per_host)
    ]


def _oracle(urls, n, tmp_path):
    import pyarrow.parquet as pq

    p = tmp_path / "pages.parquet"
    pq.write_table(pa.table({"url": pa.array(urls, pa.string())}), p)
    con = duckdb.connect()
    return (
        con.sql(SQL_HOST_QUOTA.format(pages=str(p), n=n))
        .df().sort_values(["host", "host_rank"]).reset_index(drop=True)
    )


@pytest.mark.parametrize("plan_rows", [0, 10**6])  # distributed / driver
@pytest.mark.parametrize("n", [1, 7, 40, 100])
def test_matches_window_oracle(n, plan_rows, tmp_path):
    urls = _urls()
    got = (
        host_quota(ray.data.from_items([{"url": u} for u in urls]), n,
                   driver_max_rows=plan_rows)
        .to_pandas().sort_values(["host", "host_rank"]).reset_index(drop=True)
    )
    exp = _oracle(urls, n, tmp_path)
    assert got.equals(exp[["url", "host", "host_rank"]])


def test_hot_host_skew(tmp_path):
    # one host with 2000 urls, others tiny: the cap must bite exactly;
    # forced onto the DISTRIBUTED plan so the 256-cell split is exercised
    urls = [f"https://hot.example/{i:05d}" for i in range(2000)]
    urls += [f"https://cold{j}.example/x" for j in range(5)]
    got = (
        host_quota(ray.data.from_items([{"url": u} for u in urls]), 10,
                   num_partitions=4, driver_max_rows=0)
        .to_pandas()
    )
    per_host = got.groupby("host").size().to_dict()
    assert per_host["hot.example"] == 10
    assert all(per_host[f"cold{j}.example"] == 1 for j in range(5))
    exp = _oracle(urls, 10, tmp_path)
    g = got.sort_values(["host", "host_rank"]).reset_index(drop=True)
    assert g.equals(exp[["url", "host", "host_rank"]])


def test_partition_invariance_and_plan_equality():
    urls = _urls(4, 25)
    a = host_quota(
        ray.data.from_items([{"url": u} for u in urls]).repartition(1), 9
    ).to_pandas().sort_values("url").reset_index(drop=True)
    b = host_quota(
        ray.data.from_items([{"url": u} for u in reversed(urls)])
        .repartition(7), 9, driver_max_rows=0,  # distributed plan
    ).to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_rank_contiguous_per_host():
    urls = _urls(3, 30)
    got = host_quota(ray.data.from_items([{"url": u} for u in urls]), 12
                     ).to_pandas()
    for _, g in got.groupby("host"):
        assert sorted(g["host_rank"]) == list(range(1, 13))
