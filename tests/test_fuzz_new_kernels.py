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

# --------------------------------------------------------------------------
# phrase_search kernel ↔ DuckDB parity fuzz (closing session)
# --------------------------------------------------------------------------

_PWORD = st.sampled_from(
    ["a", "b", "ab", "a.b", "0", "é", "中中", "x🙂", "Ω-1"]
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.lists(_PWORD, min_size=0, max_size=10),
             min_size=1, max_size=4),
    st.data(),
)
def test_phrase_hits_parity_fuzz(docs_tokens, data):
    """Random small-alphabet docs (forcing overlapping/adjacent gram
    collisions) + phrases drawn both from real doc slices (guaranteed
    hits) and at random (probable misses): the kernel must match the
    DuckDB n-gram recompute exactly, including occurrence counts."""
    import pyarrow as pa

    from ocr_sam_project_ray.ops.invindex import (
        phrase_hits_batch, sql_phrase_search,
    )

    texts = [" ".join(toks) for toks in docs_tokens]
    phrases = set()
    # one slice phrase per non-empty doc (guaranteed present)
    for toks in docs_tokens:
        if toks:
            n = data.draw(st.integers(1, min(3, len(toks))))
            i = data.draw(st.integers(0, len(toks) - n))
            phrases.add(" ".join(toks[i:i + n]))
    # plus a random phrase (may or may not occur)
    phrases.add(" ".join(data.draw(
        st.lists(_PWORD, min_size=1, max_size=3))))
    phrases = sorted(phrases)

    by_len = {}
    for p in phrases:
        by_len.setdefault(len(p.split()), []).append(p)
    got = (
        phrase_hits_batch(
            pa.array(range(len(texts)), pa.int64()),
            pa.array(texts, pa.string()), by_len,
        )
        .to_pandas().sort_values(["phrase", "doc_id"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    exp = con.sql(sql_phrase_search(phrases)).df()
    exp["n_hits"] = exp["n_hits"].astype("int64")
    exp["doc_id"] = exp["doc_id"].astype("int64")
    # sort BOTH sides in pandas — DuckDB's ORDER BY collation on
    # non-ASCII phrases differs from pandas codepoint order, and the
    # driver compare sorts rows itself anyway
    exp = exp.sort_values(["phrase", "doc_id"]).reset_index(drop=True)

    assert len(got) == len(exp), (texts, phrases, got, exp)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["phrase"].tolist() == exp["phrase"].tolist()
    assert got["n_hits"].tolist() == exp["n_hits"].tolist()
