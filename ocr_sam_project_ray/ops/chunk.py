"""Sliding-window document chunking — the RAG-store / training-sample
prep step: split each document into fixed-size token windows with
overlap (stride < window), the standard retrieval-chunking recipe
(e.g. Lewis et al. 2020 RAG; every embedding-store pipeline since).

Contract (what the DuckDB oracle recomputes exactly):
- token model = the engine-wide contract (ops/textstats.tokenize);
- chunk starts at token offsets 0, stride, 2*stride, ...;
  n_chunks(doc) = 1 + ceil(max(n_tok - window, 0) / stride) (integer
  formula (x + stride - 1) // stride on both sides) — full coverage, no
  redundant tail window: the last chunk may be shorter than ``window``
  but every token is in >= 1 chunk and chunk i overlaps i+1 by
  window - stride tokens;
- token-less docs (empty/NULL text) produce ZERO chunks (they carry no
  trainable content; corpus coverage accounting belongs to the quality
  ops);
- chunk_text = the window's tokens joined by ONE space (the engine-wide
  whitespace-normalized rendering, same as ops/ngram_lm gram keys);
- output (doc_id, chunk_idx, n_chunks, n_tokens, chunk_text), chunk_idx
  0-based.

Scale shape: stateless 1->N ``map_batches`` (the stages/segment.py
fan-out pattern) — no shuffle, no state; downstream embedding/indexing
stages consume the chunk rows directly. Chunks-per-doc is bounded by
doc length; a 10^6-token outlier yields ~n_tok/stride rows in ONE batch,
the same per-row fan-out bound the segment splitter documents.

The reference splits PDFs into per-oficio page ranges
(src/services/pdf_service.py splitting); this op is the token-window
analogue for model consumption — beyond-reference training-data op.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ..context import configure_data_context
from .textstats import tokenize

WINDOW = 64
STRIDE = 48


def chunk_documents(
    ds: Dataset, window: int = WINDOW, stride: int = STRIDE,
    id_col: str = "doc_id", text_col: str = "text",
) -> Dataset:
    """Dataset(doc_id, chunk_idx, n_chunks, n_tokens, chunk_text)."""
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")
    configure_data_context()

    def chunks(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "chunk_idx": [], "n_chunks": [],
               "n_tokens": [], "chunk_text": []}
        for i, text in zip(batch[id_col].to_pylist(),
                           batch[text_col].to_pylist()):
            toks = tokenize(text)
            n_tok = len(toks)
            if n_tok == 0:
                continue
            n_chunks = 1 + (max(n_tok - window, 0) + stride - 1) // stride
            for k in range(n_chunks):
                piece = toks[k * stride : k * stride + window]
                out["doc_id"].append(i)
                out["chunk_idx"].append(k)
                out["n_chunks"].append(n_chunks)
                out["n_tokens"].append(len(piece))
                out["chunk_text"].append(" ".join(piece))
        id_type = batch.schema.field(id_col).type
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], id_type),
                "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
                "n_chunks": pa.array(out["n_chunks"], pa.int64()),
                "n_tokens": pa.array(out["n_tokens"], pa.int64()),
                "chunk_text": pa.array(out["chunk_text"], pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def sql_chunk_documents(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    window: int = WINDOW, stride: int = STRIDE,
) -> str:
    """DuckDB recompute (identical integer n_chunks formula and 1-based
    inclusive list slicing for the window)."""
    toks = f"string_split_regex(trim(coalesce({text_col}, '')), '\\s+')"
    return f"""
        WITH t AS (
          SELECT {id_col} AS doc_id, {toks} AS ws
          FROM {table} WHERE trim(coalesce({text_col}, '')) <> ''
        ),
        sized AS (
          SELECT doc_id, ws,
                 1 + (greatest(len(ws) - {window}, 0) + {stride} - 1)
                     // {stride} AS n_chunks
          FROM t
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(len(ws[i * {stride} + 1 : i * {stride} + {window}])
                 AS BIGINT) AS n_tokens,
               array_to_string(
                 ws[i * {stride} + 1 : i * {stride} + {window}], ' ')
                 AS chunk_text
        FROM sized,
             UNNEST(generate_series(0, n_chunks - 1)) AS s(i)
    """
