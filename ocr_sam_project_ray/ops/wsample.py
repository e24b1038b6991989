"""Weighted sampling without replacement as a deterministic bottom-k
sketch — pick the k documents with the smallest integer priority
``u // w`` where ``u`` is a 60-bit content hash and ``w`` the row's
weight.  The weighted analogue of hash-threshold sampling
(textstats.sample_by_content_hash): heavier rows draw stochastically
smaller priorities and win proportionally more of the k slots, and the
result is reproducible from content alone — independent of partitioning,
ordering, or cluster size, and mergeable (the bottom-k of a union is the
bottom-k of the per-shard bottom-k's).

Integer contract (what the DuckDB oracle recomputes):
- ``u = int(hex(md5(text))[:15], 16)``  — 60 bits, fits BIGINT both
  engines, no masking needed;
- ``w = max(weight, 1)``;
- ``priority = u // w`` (integer floor division in both engines);
- keep the k smallest ``(priority, id)``.

This is the Efraimidis–Spirakis A-ES shape (keys ``u^(1/w)``) with an
order-deterministic integer surrogate: exact cross-engine parity with no
``ln``/``pow`` float-rounding hazard, monotone in the weight.  For the
statistically exact distribution swap the key function; the distributed
plan is identical.

Scale shape: one stateless ``map_batches`` computes priorities and prunes
each block to its local bottom-k (numpy argpartition — the global answer
is provably inside the union of per-block bottom-k's), then a small
``sort().limit(k)`` over ≤ k·n_blocks survivors.  No shuffle of the
corpus, no driver-side scan; the only all-to-all is over k·blocks rows.

The reference has no sampling stage (SURVEY §2.6); part of the engine's
beyond-reference training-data surface.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .embed import topk_tied_idx

_HEX_CHARS = 15  # 60 bits: BIGINT-safe in DuckDB and int64-safe in numpy


def _priority(texts: list, weights: np.ndarray) -> np.ndarray:
    u = np.fromiter(
        (int(hashlib.md5((t or "").encode("utf-8")).hexdigest()[:_HEX_CHARS],
             16) for t in texts),
        dtype=np.int64, count=len(texts),
    )
    return u // np.maximum(weights, 1)


def weighted_sample(
    ds: Dataset,
    k: int,
    *,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Bottom-k by ``hash60(text) // max(weight, 1)`` → Dataset(id,
    weight, priority), the k smallest (priority, id) pairs corpus-wide."""
    if k <= 0:
        raise ValueError("k must be positive")

    def local_bottom_k(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        prio = _priority(batch[text_col].to_pylist(), w)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(prio) > k:
            # prune to the local bottom-k BY THE GLOBAL ORDER (priority,
            # id): with tied priorities (identical texts + equal weight)
            # an order-free argpartition could keep a higher-id row and
            # drop the lower-id one the final sort would have chosen.
            # bottom-k == top-k of the negated priorities (non-negative
            # int64, so negation can't overflow)
            idx = topk_tied_idx(-prio, ids, k)
        else:
            idx = np.arange(len(prio))
        return pa.table({
            id_col: pa.array(ids[idx], pa.int64()),
            "weight": pa.array(np.maximum(w[idx], 1), pa.int64()),
            "priority": pa.array(prio[idx], pa.int64()),
        })

    pruned = ds.map_batches(local_bottom_k, batch_format="pyarrow")
    return pruned.sort(["priority", id_col]).limit(k)


def sql_weighted_sample(
    k: int, table: str = "documents", weight_col: str = "n_chars",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    return f"""
        WITH t AS (
          SELECT {id_col},
                 CAST(greatest({weight_col}, 1) AS BIGINT) AS weight,
                 CAST(('0x' || substr(md5(coalesce({text_col}, '')), 1,
                                      {_HEX_CHARS})) AS BIGINT) AS u
          FROM {table}
        )
        SELECT {id_col}, weight, CAST(u // weight AS BIGINT) AS priority
        FROM t ORDER BY priority, {id_col} LIMIT {k}
    """
