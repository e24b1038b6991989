"""Char-entropy signal: hand cases, DuckDB parity (incl. unicode), and
the ln floor-boundary discipline."""

import math

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.entropy import (
    SCALE, char_entropy, doc_entropy_sum, sql_char_entropy,
)

SF = "/root/testdata/sf0.001"


def test_hand_cases():
    assert doc_entropy_sum("") == (0, 0)
    assert doc_entropy_sum(None) == (0, 0)
    # single repeated char: H = 0 exactly
    assert doc_entropy_sum("aaaa") == (4, 0)
    # two equiprobable chars: n*H = 4*ln(2); per-term floor then sum
    n, s = doc_entropy_sum("abab")
    term = math.floor(SCALE * 2 * (math.log(4) - math.log(2)) + 0.5)
    assert (n, s) == (4, 2 * term)


def test_entropy_orders_content_classes():
    import numpy as np

    rng = np.random.default_rng(3)
    rand = "".join(chr(33 + int(x)) for x in rng.integers(0, 90, 2000))
    prose = (
        "the quick brown fox jumps over the lazy dog and keeps going "
    ) * 40
    mash = "aaaaabbbbb" * 200
    def nats(t):
        n, s = doc_entropy_sum(t)
        return s / (n * SCALE)
    assert nats(mash) < nats(prose) < nats(rand)


def test_matches_duckdb_with_unicode():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["añ🙂b añ🙂b", "", None, "éxé"],
            }
        )
    )
    got = (
        char_entropy(docs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'añ🙂b añ🙂b'), (2, ''), (3, NULL), (4, 'éxé')"
        ") t(doc_id, text)"
    )
    exp = con.sql(sql_char_entropy()).df()
    for c in exp.columns:
        exp[c] = exp[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_matches_duckdb_corpus():
    got = (
        char_entropy(ray.data.read_parquet(f"{SF}/documents.parquet"))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.sql(sql_char_entropy()).df()
    for c in exp.columns:
        exp[c] = exp[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)