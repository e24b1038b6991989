import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.grouped_quantiles import (
    grouped_token_quantiles, sql_grouped_token_quantiles,
)

SF = "/root/testdata/sf0.001"


def test_matches_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    got = (
        grouped_token_quantiles(ds)
        .sort_values("lang").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(sql_grouped_token_quantiles()).df()
        .sort_values("lang").reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def test_duckdb_rank_rule_is_ceil_qn_minus_1():
    # pin the contract: quantile_disc rank (0-based) = ceil(q*n) - 1
    import math

    con = duckdb.connect()
    for n in (4, 5, 10, 71, 100, 333):
        vals = list(range(1, n + 1))
        for q in (0.5, 0.9, 0.99):
            duck = con.execute(
                "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)",
                [q, vals],
            ).fetchone()[0]
            assert duck == vals[max(0, math.ceil(q * n) - 1)], (n, q)


def test_quantile_disc_semantics_per_group():
    # group a: token counts 1..10 -> p50 = value at rank ceil(5)-1=4 -> 5
    texts, langs = [], []
    for n in range(1, 11):
        texts.append(" ".join(["w"] * n))
        langs.append("a")
    texts.append("w w w")
    langs.append("b")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )
    )
    got = grouped_token_quantiles(ds).set_index("lang")
    assert got.loc["a"].p50 == 5 and got.loc["a"].n_docs == 10
    assert got.loc["a"].p90 == 9  # rank ceil(10*0.9)-1=8 -> value 9
    assert got.loc["b"].p50 == got.loc["b"].p99 == 3


def test_partition_invariant():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    a = grouped_token_quantiles(ds).sort_values("lang").values.tolist()
    b = (grouped_token_quantiles(ds.repartition(7), num_partitions=3)
         .sort_values("lang").values.tolist())
    assert a == b
