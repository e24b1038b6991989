import duckdb
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.chunk import chunk_documents, sql_chunk_documents

SF = "/root/testdata/sf0.001"


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )


def test_window_and_overlap_semantics():
    # 10 tokens, window 4, stride 3 -> chunks at 0,3,6 and tail at 9?
    # n_chunks = 1 + ceil((10-4)/3) = 3 -> offsets 0,3,6 (covers 0..9)
    text = " ".join(f"t{i}" for i in range(10))
    got = (
        chunk_documents(_ds([text]), window=4, stride=3)
        .to_pandas().sort_values("chunk_idx").reset_index(drop=True)
    )
    assert got.n_chunks.tolist() == [3, 3, 3]
    assert got.chunk_text.tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"
    ]
    assert got.n_tokens.tolist() == [4, 4, 4]
    # full coverage with overlap window-stride = 1
    assert got.chunk_text[0].split()[-1] == got.chunk_text[1].split()[0]


def test_short_and_empty_docs():
    got = (
        chunk_documents(_ds(["a b", "", None]), window=4, stride=3)
        .to_pandas()
    )
    # short doc -> exactly one (short) chunk; empty/null -> zero chunks
    assert len(got) == 1
    assert got.iloc[0].chunk_text == "a b"
    assert got.iloc[0].n_chunks == 1 and got.iloc[0].n_tokens == 2


def test_tail_chunk_is_short_not_redundant():
    # 11 tokens, window 4, stride 3: n_chunks = 1+ceil(7/3)=4
    # offsets 0,3,6,9; last = tokens 9,10 (len 2)
    text = " ".join(f"t{i}" for i in range(11))
    got = (
        chunk_documents(_ds([text]), window=4, stride=3)
        .to_pandas().sort_values("chunk_idx").reset_index(drop=True)
    )
    assert len(got) == 4
    assert got.iloc[3].chunk_text == "t9 t10"
    assert got.iloc[3].n_tokens == 2


def test_invalid_stride_rejected():
    with pytest.raises(ValueError):
        chunk_documents(_ds(["a"]), window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(_ds(["a"]), window=4, stride=0)


def test_matches_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = (
        chunk_documents(ds).to_pandas()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(sql_chunk_documents()).df()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()
    # every multi-chunk doc overlaps window-stride tokens between chunks
    multi = got[got.n_chunks > 1]
    assert len(multi) > 0
