"""Hashing-vectorizer linear classifier scoring — the fastText-style
quality-filter shape (Joulin et al. 2016; the CCNet/C4 pipelines score
every document with a linear model over hashed token features and keep
or drop on the sign). No model artifact ships with this repo, so the
weight table is a DETERMINISTIC function of the feature hash — the
Ray-side plumbing (hash → weight lookup → per-doc reduction → gate) is
the real operator; swapping in trained weights is a broadcast lookup
with identical shape.

Exact integer contract (what the DuckDB oracle recomputes):
- token model = the engine-wide contract (ops/textstats.tokenize);
- feature hash   h(tok) = (len(tok)*97 + cp_first*31 + cp_last) mod D
  where cp_* are Unicode code points (DuckDB ascii(substr(...)) ==
  Python ord on any text, both character-addressed) and D = 1024;
- weight        w(h) = (h * 2654435761) mod 1997 - 998   (Knuth
  multiplicative constant; odd modulus centers the lattice near 0;
  h < D so the product stays < 2^42 — exact in BIGINT and int64);
- clf_score(d)  = integer sum of w(h(tok)) over d's tokens WITH
  multiplicity (token-less docs score 0);
- gate          = 'keep' when clf_score >= 0 else 'drop'.

Scale shape: one stateless column-pruned map_batches — no shuffle, no
state, no driver traffic; the kernel is fully vectorized (tokens of a
batch are flattened once; code points come from a numpy U-dtype
uint32 view, per-doc reduction is one bincount).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .textstats import flat_tokens, token_lff

HASH_DIM = 1024
WEIGHT_MULT = 2654435761
WEIGHT_MOD = 1997
WEIGHT_SHIFT = 998


def _scores(col) -> np.ndarray:
    """Vectorized per-doc integer scores for one batch. ``col`` is the
    Arrow text column; no Python string materializes anywhere —
    tokenization is textstats.flat_tokens and the (len, first, last)
    char features decode straight from the token buffers
    (textstats.token_lff, which replaced the padded numpy-U view and
    its degenerate-token guard: buffer decode is O(bytes) regardless of
    the longest token)."""
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(list(col), pa.string())
    n_docs = len(col)
    _dl, flat, doc_idx = flat_tokens(col)
    scores = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        lens, first, last = token_lff(flat)
        h = (lens * 97 + first * 31 + last) % HASH_DIM
        w = (h * WEIGHT_MULT) % WEIGHT_MOD - WEIGHT_SHIFT
        # |w| < 1000 and float64 sums are exact far beyond any real
        # per-doc token count, so the float bincount is integer-exact
        scores = np.bincount(
            doc_idx, weights=w, minlength=n_docs
        ).astype(np.int64)
    return scores


def hashclf_score(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """(doc_id, clf_score, gate) for every input row."""
    configure_data_context()

    def score_batch(batch: pa.Table) -> pa.Table:
        s = _scores(batch[text_col])
        gate = np.where(s >= 0, "keep", "drop")
        return pa.table(
            {
                id_col: batch[id_col],
                "clf_score": pa.array(s, pa.int64()),
                "gate": pa.array(gate, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score_batch, batch_format="pyarrow"
    )


def sql_hashclf_score(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
        WITH tok AS (
          SELECT {id_col} AS doc_id,
                 unnest(string_split_regex(trim({text_col}), '\\s+')) AS tok
          FROM {table} WHERE trim(coalesce({text_col}, '')) <> ''
        ),
        h AS (
          SELECT doc_id,
                 (length(tok)*97
                  + ascii(substr(tok, 1, 1))*31
                  + ascii(substr(tok, length(tok), 1))) % {HASH_DIM} AS hh
          FROM tok
        ),
        s AS (
          SELECT doc_id,
                 CAST(sum((hh * {WEIGHT_MULT}) % {WEIGHT_MOD}
                          - {WEIGHT_SHIFT}) AS BIGINT) AS clf_score
          FROM h GROUP BY doc_id
        )
        SELECT d.{id_col} AS doc_id,
               CAST(coalesce(s.clf_score, 0) AS BIGINT) AS clf_score,
               CASE WHEN coalesce(s.clf_score, 0) >= 0
                    THEN 'keep' ELSE 'drop' END AS gate
        FROM {table} d LEFT JOIN s ON d.{id_col} = s.doc_id
        ORDER BY doc_id
    """
