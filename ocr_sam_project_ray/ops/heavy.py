"""Heavy hitters: exact corpus-wide top-k frequent tokens, and the
count-min-sketch scale path for vocabularies too large to shuffle.

A training-data pipeline asks "what are the most frequent terms / hosts /
templates in this corpus" constantly — for stopword mining, boilerplate
discovery, contamination triage, and tokenizer-vocab audits. At 100 TB the
full (token -> count) groupby is itself a terabyte-scale shuffle; the
classic answer (Cormode & Muthukrishnan 2005, "An Improved Data Stream
Summary: the Count-Min Sketch") is a fixed-size mergeable sketch.

Two implementations, one contract:

1. ``top_tokens`` — EXACT. Reuses the ``token_df`` combiner->shuffle
   (per-batch Counter partial, one token-hash groupby), then prunes each
   vocabulary block to its local top-k (a token's groupby row is globally
   final, so per-block pruning is lossless for the global top-k), and
   sort-limits the tiny pruned set (k rows per block, not the vocab).
   Ties break by token ASC. Output (rank, token, tf, df) — what the
   DuckDB oracle recomputes verbatim.

2. ``cms_topk`` — APPROXIMATE, bounded memory. One ``map_batches`` pass
   emits per batch: a depth x width uint64 count-min matrix (serialized)
   plus that batch's local top-``candidates_per_batch`` tokens. Merge is
   elementwise SUM (associative + commutative — executor order never
   changes the result); the driver folds n_batches fixed-size rows, never
   token rows. Final counts for the unioned candidates are read from the
   merged sketch (min over depth rows); top-k by (est DESC, token ASC).
   Guarantees (standard CMS): est >= true always (no under-count);
   est <= true + eps*N with prob >= 1-delta for eps = e/width,
   delta = exp(-depth). Candidate recall is the usual local-top-m
   assumption: a global heavy hitter must reach the local top-m in at
   least one batch — guaranteed for skewed (zipfian) frequency
   distributions, probabilistic for adversarially flat ones; pytest
   certifies recall 1.0 on a zipf corpus and the overestimate bound.

Hashing is md5-derived with the row index as salt (never the salted
builtin ``hash``), so sketches are deterministic across processes.

Behavioral lineage: the reference has no corpus-level statistics at all
(one document per Lambda invocation, src/ocr_processor/app.py:94-138);
this op is part of the engine's beyond-reference training-data surface.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import configure_data_context
from .corpus_stats import token_df
from .textstats import tokenize

DEFAULT_K = 20
CMS_WIDTH = 16384          # eps = e/width ~ 1.7e-4 of total mass
CMS_DEPTH = 4              # delta = e^-4 ~ 1.8%


def top_tokens(
    ds: Dataset, k: int = DEFAULT_K, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
) -> pa.Table:
    """Exact global top-k tokens by total occurrences (ties: token ASC).

    Returns a driver-side Arrow table of exactly ``min(k, vocab)`` rows —
    bounded output by construction, so the driver return is scale-safe.
    Columns: (rank:int64, token:string, tf:int64, df:int64).
    """
    configure_data_context()
    vocab = token_df(ds, id_col=id_col, text_col=text_col,
                     num_partitions=num_partitions)

    def prune(batch: pa.Table) -> pa.Table:
        # Each groupby output row is globally final, so local top-k
        # pruning cannot evict a global top-k token.
        if batch.num_rows <= k:
            return batch
        order = pc.sort_indices(
            batch, sort_keys=[("tf", "descending"), ("token", "ascending")]
        )
        return batch.take(order[:k])

    pruned = vocab.map_batches(prune, batch_format="pyarrow")
    rows = pruned.sort(["tf", "token"], descending=[True, False]).limit(k)
    out = pa.Table.from_pandas(rows.to_pandas(), preserve_index=False)
    rank = pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
    return pa.table(
        {
            "rank": rank,
            "token": out["token"],
            "tf": out["tf"].cast(pa.int64()),
            "df": out["df"].cast(pa.int64()),
        }
    )


def sql_top_tokens(k: int = DEFAULT_K) -> str:
    """DuckDB recompute of ``top_tokens`` (engine-wide token model)."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        counts AS (
          SELECT token, CAST(count(*) AS BIGINT) AS tf,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM toks GROUP BY token
        )
        SELECT CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT)
                 AS rank,
               token, tf, df
        FROM counts
        ORDER BY tf DESC, token
        LIMIT {k}
    """


# --------------------------------------------------------------------------
# count-min sketch scale path
# --------------------------------------------------------------------------

def _cms_rows(token: str, depth: int, width: int) -> list[int]:
    """Deterministic per-row bucket indices for one token."""
    return [
        int.from_bytes(
            hashlib.md5(f"{d}:{token}".encode("utf-8")).digest()[:8], "big"
        ) % width
        for d in range(depth)
    ]


def cms_update(
    mat: np.ndarray, counts: Counter, width: int
) -> None:
    """Add a Counter of token counts into a depth x width uint64 matrix."""
    depth = mat.shape[0]
    for tok, c in counts.items():
        for d, idx in enumerate(_cms_rows(tok, depth, width)):
            mat[d, idx] += c


def cms_estimate(mat: np.ndarray, token: str) -> int:
    """Point query: min over depth rows (never under-counts)."""
    depth, width = mat.shape
    return int(min(mat[d, idx]
                   for d, idx in enumerate(_cms_rows(token, depth, width))))


def cms_topk(
    ds: Dataset, k: int = DEFAULT_K, text_col: str = "text",
    width: int = CMS_WIDTH, depth: int = CMS_DEPTH,
    candidates_per_batch: int | None = None,
) -> dict:
    """Approximate top-k tokens with one streaming pass and fixed memory.

    Returns {"topk": [(token, est_tf), ...] sorted (est DESC, token ASC),
    "total_tokens": N, "n_sketches": folded batch count}. Driver holds
    only n_batches fixed-size sketch rows plus the candidate union —
    never the vocabulary.
    """
    configure_data_context()
    m = candidates_per_batch if candidates_per_batch is not None else 8 * k

    def per_batch(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch[text_col].to_pylist():
            counts.update(tokenize(text))
        mat = np.zeros((depth, width), dtype=np.uint64)
        cms_update(mat, counts, width)
        # local candidates: top-m by (count DESC, token ASC)
        cand = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        return pa.table(
            {
                "sketch": pa.array([mat.tobytes()], pa.binary()),
                "candidates": pa.array(
                    [[t for t, _ in cand]], pa.list_(pa.string())
                ),
                "n_tokens": pa.array(
                    [int(sum(counts.values()))], pa.int64()
                ),
            }
        )

    partials = ds.map_batches(per_batch, batch_format="pyarrow")
    merged = np.zeros((depth, width), dtype=np.uint64)
    candidates: set[str] = set()
    total = 0
    n_sketches = 0
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s, cand, n in zip(
            b["sketch"].to_pylist(), b["candidates"].to_pylist(),
            b["n_tokens"].to_pylist(),
        ):
            merged += np.frombuffer(s, dtype=np.uint64).reshape(depth, width)
            candidates.update(cand)
            total += n
            n_sketches += 1

    scored = sorted(
        ((tok, cms_estimate(merged, tok)) for tok in candidates),
        key=lambda kv: (-kv[1], kv[0]),
    )[:k]
    return {"topk": scored, "total_tokens": total, "n_sketches": n_sketches}
