"""JSONL source/sink round-trip and pruning."""

import glob
import json

import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.sources.jsonl import read_jsonl, write_jsonl

SF = "/root/testdata/sf0.001"


def test_roundtrip_documents(tmp_path):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    files = glob.glob(f"{out}/*.json")
    assert files, "sink wrote no shards"
    back = read_jsonl(files).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back.columns) == list(orig.columns) or set(back.columns) == set(orig.columns)
    back = back[orig.columns.tolist()]
    assert len(back) == len(orig)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    assert back["text"].tolist() == orig["text"].tolist()
    assert back["n_chars"].tolist() == orig["n_chars"].tolist()


def test_read_handcrafted_lines_and_prune(tmp_path):
    p = tmp_path / "part-0.jsonl"
    rows = [
        {"id": 1, "text": "hola mundo", "junk": "x"},
        {"id": 2, "text": "", "junk": "y"},
        {"id": 3, "text": "línea três", "junk": "z"},
    ]
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows) + "\n",
                 encoding="utf-8")
    ds = read_jsonl(str(p), columns_select=["id", "text"])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "text"]
    assert df["text"].tolist() == ["hola mundo", "", "línea três"]


def test_sink_is_partitioned(tmp_path):
    t = pa.table({"i": pa.array(range(100), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "sharded")
    write_jsonl(ds, out)
    files = glob.glob(f"{out}/*.json")
    assert len(files) >= 2, "expected multiple shards, got one giant file"
