"""Character-entropy quality signal — the information-density gate that
separates natural text (≈2.9 nats/char English unigram), keyboard mash /
repeated-char padding (low entropy), and uniform-random encodings
(near-maximal entropy). Complements the zlib ratio
(ops/compressratio.py, byte-level with context) with a context-free
distributional measure that IS SQL-recomputable.

Exact integer contract (the ops/dsir.py ln discipline — numpy and
DuckDB ln agree to ≤1 ulp on this platform, measured there):
    per (doc, distinct char c):
        term_c = n_c * floor(1e6 * (ln(n) - ln(n_c)) + 0.5)
    entropy_sum_micronat(doc) = Σ_c term_c     [≈ n · H(doc) scaled]
    n = total code points (Python list(text) == DuckDB
        string_split(text,'') — code-point parity verified in tests)
The count multiplier sits OUTSIDE the floor on purpose: flooring
``n_c * (ln − ln)`` would amplify the ≤1-ulp ln divergence by n_c and
flip the floor on realistic large documents (reproduced during review:
'a'*90907+'b' flipped by 1); with only the ln difference inside, the
pre-floor absolute error is ~3e-9 — the same dsir-grade boundary risk,
and the subsequent multiply/sum are exact integer arithmetic,
order-free. (At true 100 TB term counts even that residual boundary
probability accumulates — documented, the same caveat as bm25's 2^53
guard; the oracle regime is the sandbox tiers.) Empty docs → n = 0,
entropy_sum = 0. Callers divide by n·1e6 for nats/char; shipping the
undivided sum keeps the contract division-free.

Scale shape: stateless column-pruned map_batches — counts per doc via
one numpy unique per doc over code points (bounded by alphabet size),
no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..context import configure_data_context

SCALE = 1_000_000  # micro-nats


def doc_entropy_sum(text: str | None) -> tuple[int, int]:
    """(n_chars, entropy_sum_micronat) for one document."""
    t = text or ""
    n = len(t)
    if n == 0:
        return 0, 0
    # single-copy code-point view (utf-32-le bytes ARE the uint32 codes)
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    _, counts = np.unique(codes, return_counts=True)
    nc = counts.astype(np.float64)
    # fixed operand order ln(n) - ln(n_c); count multiplier OUTSIDE the
    # floor (see module docstring) → exact integer multiply-and-sum
    quant = np.floor(
        SCALE * (np.log(float(n)) - np.log(nc)) + 0.5
    ).astype(np.int64)
    return n, int((counts.astype(np.int64) * quant).sum())


def char_entropy(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """(doc_id, n_chars_ent, entropy_sum_micronat) per row."""
    configure_data_context()

    def score(batch: pa.Table) -> pa.Table:
        ns, sums = [], []
        for t in batch[text_col].to_pylist():
            n, s = doc_entropy_sum(t)
            ns.append(n)
            sums.append(s)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars_ent": pa.array(ns, pa.int64()),
                "entropy_sum_micronat": pa.array(sums, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def sql_char_entropy(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
        WITH docs AS (
          SELECT {id_col} AS doc_id, coalesce({text_col}, '') AS text
          FROM {table}
        ),
        chars AS (
          SELECT doc_id, unnest(string_split(text, '')) AS c
          FROM docs WHERE text <> ''
        ),
        per_char AS (
          SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n_c
          FROM chars GROUP BY doc_id, c
        ),
        per_doc AS (
          SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS n FROM per_char
          GROUP BY doc_id
        ),
        terms AS (
          SELECT p.doc_id,
                 p.n_c * CAST(floor({SCALE} * (
                        ln(CAST(d.n AS DOUBLE)) - ln(CAST(p.n_c AS DOUBLE))
                      ) + 0.5) AS BIGINT) AS term
          FROM per_char p JOIN per_doc d USING (doc_id)
        ),
        sums AS (
          SELECT doc_id, CAST(sum(term) AS BIGINT) AS entropy_sum_micronat
          FROM terms GROUP BY doc_id
        )
        SELECT docs.doc_id,
               CAST(coalesce(d.n, 0) AS BIGINT) AS n_chars_ent,
               CAST(coalesce(s.entropy_sum_micronat, 0) AS BIGINT)
                 AS entropy_sum_micronat
        FROM docs
        LEFT JOIN per_doc d ON d.doc_id = docs.doc_id
        LEFT JOIN sums s ON s.doc_id = docs.doc_id
        ORDER BY docs.doc_id
    """
