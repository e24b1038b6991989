"""Gopher repetition signals: hand-computed goldens, DuckDB parity on
adversarial texts, and the Dataset stage end-to-end."""

import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.repetition import (
    repetition_batch,
    repetition_row,
    score_repetition,
    sql_repetition,
)

ADVERSARIAL = [
    "a b a b a b",
    "x",
    "",
    "a a a a",
    "the cat sat on the cat sat again",
    "w1 w2 w3 w4 w5",
    "p q p q r p q p q r",
    "one two  three",   # double space -> empty token, split(' ') semantics
    None,
]


def test_hand_golden_bigrams():
    r = repetition_row("a b a b a b")
    # bigrams: "a b" x3, "b a" x2
    assert r["n_words"] == 6
    assert r["top1_count"] == 3
    assert r["top2_count"] == 3
    assert r["dup2_count"] == (3 - 1) + (2 - 1)
    assert r["dup2_chars"] == 3 * 3 + 2 * 3
    assert r["dup2_ppm"] == 3 * 1_000_000 // 5


def test_empty_and_single_word():
    for t in ("", None, "x"):
        r = repetition_row(t)
        assert r["n_words"] == 1
        assert r["top1_count"] == 1
        assert r["top2_count"] == 0 and r["dup2_ppm"] == 0
        assert r["top3_count"] == 0 and r["dup3_ppm"] == 0


def test_split_matches_duckdb_on_double_space():
    # ''.split(' ') and double spaces must mirror string_split exactly
    assert repetition_row("one two  three")["n_words"] == 4


def test_duckdb_parity():
    t = pa.table({
        "doc_id": pa.array(range(len(ADVERSARIAL)), pa.int64()),
        "text": pa.array(ADVERSARIAL, pa.string()),
    })
    eng = (repetition_batch(t).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    exp = (con.sql(sql_repetition()).df()
           .sort_values("doc_id").reset_index(drop=True))[list(eng.columns)]
    assert eng.astype("int64").equals(exp.astype("int64"))


def test_dataset_stage():
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a b", "c d e"], pa.string()),
    })
    df = score_repetition(ray.data.from_arrow(t)).to_pandas()
    assert len(df) == 2
    assert df.set_index("doc_id").loc[1, "dup2_count"] == 1
    assert df.set_index("doc_id").loc[2, "dup2_count"] == 0
