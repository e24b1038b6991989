"""Hypothesis fuzz for the round-3 third-session kernels: hash-classifier
cross-engine parity on arbitrary token content, and CDC chunking
invariants on arbitrary text.

The hashclf alphabet deliberately excludes exotic whitespace: the
engine-wide token model is Python ``\\s+`` after ``strip()`` while the
SQL rendering is RE2 ``\\s+`` after ``trim()`` — identical on the plain
space / controlled corpus domain the oracles run on, documented as the
contract boundary. The fuzz probes the UNICODE CODE-POINT arithmetic
(length / first / last, multi-byte and non-BMP) where divergence would
be a real bug."""

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from ocr_sam_project_ray.ops.cdc import CDC_MAX, CDC_MIN, chunk_spans
from ocr_sam_project_ray.ops.hashclf import _scores, sql_hashclf_score

# letters/digits/punct + multi-byte + non-BMP, single plain space only
_ALPHA = st.sampled_from(
    list("abcXYZ019.,;:!?-_/") + ["é", "ü", "ñ", "中", "日", "Ω", "𝒳", "🙂", " "]
)
_TEXT = st.text(alphabet=_ALPHA, min_size=0, max_size=60)


@settings(max_examples=40, deadline=None)
@given(_TEXT)
def test_hashclf_parity_fuzz(text):
    got = int(_scores([text])[0])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT CAST(1 AS BIGINT) AS doc_id, "
        "CAST(? AS VARCHAR) AS text",
        [text],
    )
    exp = con.sql(sql_hashclf_score()).fetchone()[1]
    assert got == int(exp), f"parity broke on {text!r}: {got} vs {exp}"


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=0, max_size=4000))
def test_cdc_spans_invariants_fuzz(text):
    spans = chunk_spans(text)
    n = len((text or "").encode("utf-8", "replace"))
    if n == 0:
        assert spans == []
        return
    # exact tiling
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1
    # size bounds (tail may undershoot the min)
    for s, e in spans:
        assert e - s <= CDC_MAX
        assert e > s
    for s, e in spans[:-1]:
        assert e - s >= CDC_MIN
    # determinism
    assert chunk_spans(text) == spans


@settings(max_examples=30, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=6))
def test_hashclf_batch_equals_per_doc(texts):
    batch = _scores(texts)
    singles = np.array([_scores([t])[0] for t in texts], dtype=np.int64)
    assert batch.tolist() == singles.tolist()