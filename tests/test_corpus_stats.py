"""Corpus statistics operators vs hand-computed and DuckDB-recomputed
expectations."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.corpus_stats import (
    events_cumsum, host_stats, token_count_quantiles, token_df,
)

SF = "/root/testdata/sf0.001"


def test_token_df_hand_case():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["a b a", "b c", "", "   "],
            }
        )
    ).repartition(3)
    out = token_df(docs, num_partitions=2).to_pandas().set_index("token")
    assert out.loc["a"].df == 1 and out.loc["a"].tf == 2
    assert out.loc["b"].df == 2 and out.loc["b"].tf == 2
    assert out.loc["c"].df == 1 and out.loc["c"].tf == 1
    assert len(out) == 3  # empty/whitespace docs contribute nothing


def test_token_df_matches_duckdb():
    docs_path = f"{SF}/documents.parquet"
    got = (
        token_df(ray.data.read_parquet(docs_path), num_partitions=4)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM read_parquet('{docs_path}') WHERE trim(text) <> ''
        )
        SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY token ORDER BY token
        """
    ).df()
    assert got.token.tolist() == exp.token.tolist()
    assert got.df.tolist() == exp.df.tolist()
    assert got.tf.tolist() == exp.tf.tolist()


def test_events_cumsum_matches_duckdb():
    got = events_cumsum(SF).to_pandas().sort_values("event_id").reset_index(
        drop=True
    )
    exp = duckdb.sql(
        f"""
        SELECT event_id, user_id,
               CAST(sum(CAST(round(value*100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                 AS cum_value_cents
        FROM read_parquet('{SF}/events.parquet') ORDER BY event_id
        """
    ).df()
    assert got.cum_value_cents.tolist() == exp.cum_value_cents.tolist()
    assert got.event_id.tolist() == exp.event_id.tolist()


def test_host_stats_counts():
    from ocr_sam_project_ray.sources.synthetic import ensure_corpus

    paths = ensure_corpus(SF)
    got = host_stats(paths["pages"])
    assert (got.n_pages >= got.n_urls).all()  # dup urls collapse in n_urls
    assert got.host.str.match(r"^portal\d+\.example\.pa$").all()
    import pyarrow.dataset as pads

    t = pads.dataset(paths["pages"], format="parquet").to_table(columns=["url"])
    assert got.n_pages.sum() == t.num_rows
    assert got.n_urls.sum() == len(set(t["url"].to_pylist()))


def test_quantiles_hand_case_and_duckdb_parity():
    texts = [" ".join(["w"] * n) for n in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(10), pa.int64()), "text": texts})
    ).repartition(3)
    out = token_count_quantiles(docs, qs=(0.5, 0.9))
    # quantile_disc: element at floor((n-1)q) of the sorted multiset
    assert out.p50.iloc[0] == 5 and out.p90.iloc[0] == 9
    exp = duckdb.sql(
        "SELECT quantile_disc(x, 0.5) AS p50, quantile_disc(x, 0.9) AS p90 "
        "FROM (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS x)"
    ).df()
    assert out.p50.iloc[0] == exp.p50.iloc[0]
    assert out.p90.iloc[0] == exp.p90.iloc[0]


def test_pack_documents_matches_duckdb():
    from ocr_sam_project_ray.ops.corpus_stats import (
        SQL_PACK_DOCUMENTS, pack_documents,
    )
    from ocr_sam_project_ray.ops.textstats import sql_n_tokens

    docs_path = f"{SF}/documents.parquet"
    got = pack_documents(
        ray.data.read_parquet(docs_path), budget=512
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    sql = SQL_PACK_DOCUMENTS.format(n_tokens=sql_n_tokens("text"), budget=512)
    exp = duckdb.sql(
        sql.replace("FROM documents", f"FROM read_parquet('{docs_path}')")
    ).df()
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.pack_id.tolist() == exp.pack_id.tolist()
    # packing invariants: ids start at 0, are contiguous, and every pack
    # except possibly the last holds <= budget + one overflowing doc
    assert got.pack_id.min() == 0
    assert set(got.pack_id) == set(range(got.pack_id.max() + 1))


def test_pack_documents_partition_invariant():
    """The deterministic shuffle must be independent of input block
    layout: different repartitioning, identical pack assignment."""
    from ocr_sam_project_ray.ops.corpus_stats import pack_documents

    docs_path = f"{SF}/documents.parquet"
    a = pack_documents(
        ray.data.read_parquet(docs_path), budget=256
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pack_documents(
        ray.data.read_parquet(docs_path).repartition(7), budget=256
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.pack_id.tolist() == b.pack_id.tolist()


def test_pack_documents_streams_to_parquet(tmp_path):
    """pack_documents returns a streaming Dataset: end-to-end to parquet
    with NO driver materialization, and the written plan equals the
    collected one."""
    from ocr_sam_project_ray.ops.corpus_stats import pack_documents

    docs_path = f"{SF}/documents.parquet"
    out_dir = str(tmp_path / "packs")
    ds = pack_documents(ray.data.read_parquet(docs_path), budget=512)
    import ray.data as rd

    assert isinstance(ds, rd.Dataset)
    ds.write_parquet(out_dir)
    import duckdb as dd

    written = dd.sql(
        f"SELECT doc_id, pack_id FROM read_parquet('{out_dir}/*.parquet') "
        "ORDER BY doc_id"
    ).df()
    collected = pack_documents(
        ray.data.read_parquet(docs_path), budget=512
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert written.pack_id.tolist() == collected.pack_id.tolist()
