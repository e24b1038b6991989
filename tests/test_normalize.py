"""Normalization chain: Arrow↔DuckDB byte parity on adversarial Unicode
(composed vs decomposed accents, case, whitespace runs, tabs/newlines),
and normalized dedup semantics (variants collapse, min id survives,
payload untouched)."""

import unicodedata

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.normalize import (
    dedup_exact_normalized,
    normalize_expr,
    normalize_text,
    sql_normalize_expr,
)

ADVERSARIAL = [
    "Café",                                  # composed é
    unicodedata.normalize("NFD", "Café"),    # decomposed e + U+0301
    "  A  B\tC ",
    "a\nb\r\nc",
    "MAYÚSCULAS y Señal",
    unicodedata.normalize("NFD", "MAYÚSCULAS y Señal"),
    "ß strasse",
    "",
    "   ",
    "ya normalizado",
]


def test_parity_with_duckdb():
    got = normalize_expr(pa.array(ADVERSARIAL, pa.string())).to_pylist()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": ADVERSARIAL}))
    exp = con.sql(
        f"SELECT {sql_normalize_expr('x')} AS n FROM t").df()["n"].tolist()
    assert got == exp
    # the two accent encodings now render identically
    assert got[0] == got[1] and got[4] == got[5]


def test_normalize_text_stage():
    ds = ray.data.from_items([{"text": t} for t in ADVERSARIAL] +
                             [{"text": None}])
    out = normalize_text(ds).to_pandas()
    assert out.loc[out["text"].isna(), "norm_text"].tolist() == [""]
    assert (out["norm_text"] == out["norm_text"].str.strip()).all()


def test_dedup_exact_normalized():
    rows = [
        {"doc_id": 1, "text": "Hola  Mundo", "extra": "a"},
        {"doc_id": 2, "text": "hola mundo", "extra": "b"},      # dup of 1
        {"doc_id": 3, "text": unicodedata.normalize("NFD", "adiós"),
         "extra": "c"},
        {"doc_id": 4, "text": "ADIÓS", "extra": "d"},           # dup of 3
        {"doc_id": 5, "text": "distinto", "extra": "e"},
        {"doc_id": 6, "text": None, "extra": "f"},
        {"doc_id": 7, "text": "  ", "extra": "g"},              # dup of 6
    ]
    out = (
        dedup_exact_normalized(ray.data.from_items(rows), num_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3, 5, 6]
    # payload untouched: original (non-normalized) text survives
    assert out.loc[0, "text"] == "Hola  Mundo"
    assert list(out.columns) == ["doc_id", "text", "extra"]
