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
    # two equiprobable chars: quantize ln(4)-ln(2) once, multiply by
    # the exact integer count (the multiplier sits OUTSIDE the floor)
    n, s = doc_entropy_sum("abab")
    quant = math.floor(SCALE * (math.log(4) - math.log(2)) + 0.5)
    assert (n, s) == (4, 2 * (2 * quant))


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


def test_floor_boundary_large_doc_matches_duckdb():
    # regression for the confirmed review repro: with the count
    # multiplier INSIDE the floor, 'a'*90907 + 'b' flipped the floor
    # (engine 12417597 vs oracle 12417598) because the ~1e-5-nat ln
    # difference times 90907 amplified the 1-ulp ln divergence past the
    # boundary. With the multiplier outside, both engines agree exactly.
    big = "a" * 90907 + "b"
    got_n, got_s = doc_entropy_sum(big)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT CAST(1 AS BIGINT) AS doc_id, "
        "CAST(? AS VARCHAR) AS text",
        [big],
    )
    exp = con.sql(sql_char_entropy()).df().iloc[0]
    assert (got_n, got_s) == (
        int(exp.n_chars_ent), int(exp.entropy_sum_micronat)
    )


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