"""Winnowing passage fingerprints — local document fingerprinting for
PASSAGE-level duplicate detection (Schleimer, Wilkerson & Aiken, "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
algorithm). Doc-level near-dup (MinHash/SimHash) misses two documents that
share one long boilerplate paragraph inside otherwise-different text; this
op finds exactly those shared passages.

Algorithm (all vectorized numpy, zero Python loops over positions):
1. char ``k``-gram rolling hashes: byte windows → polynomial combine →
   splitmix64 finalize (the engine's standard mixer, ops/dedup_text);
2. WINNOW: over every window of ``w`` consecutive gram hashes select the
   minimum, rightmost on ties → fingerprint positions. The published
   guarantee: any shared substring of length ≥ ``w + k - 1`` chars shares
   at least one selected fingerprint, while only ~2/(w+1) of grams are
   kept — the density/guarantee trade-off that makes this scale;
3. explode to (fp:int64, doc_id, pos) rows; hash-repartition on ``fp`` —
   the op's ONLY shuffle, moving just 24 bytes per fingerprint, never text;
4. within-partition: docs sharing a fingerprint → pair rows; pair-key
   repartition → per-pair count of DISTINCT shared fingerprints →
   ``n_shared ≥ min_shared`` filter.

Skew guards (same failure mode as LSH buckets): a fingerprint shared by
more than ``max_docs_per_fp`` docs is degenerate boilerplate (emitting its
O(m²) pairs would melt the partition) — it is skipped and COUNTED via the
shared zero-CPU stats actor (no-silent-caps rule). Docs shorter than ``k``
chars have no grams and never match (documented, same contract as the
empty-shingle LSH guard).

Not SQL-expressible at reasonable cost (rolling hash + windowed argmin per
char position) → pytest-certified instead: the w+k-1 guarantee, window
coverage density, partition invariance, and planted-passage recall with
zero false positives (tests/test_winnow.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
from numpy.lib.stride_tricks import sliding_window_view
from ray.data import Dataset

from ..context import configure_data_context
from .dedup_text import LshDropStats, _splitmix64

DEFAULT_K = 8        # char-gram length
DEFAULT_W = 4        # winnow window (guarantee length = w + k - 1 = 11)
MAX_DOCS_PER_FP = 64  # hot-fingerprint guard
_BASE = np.uint64(1099511628211)  # FNV prime as the polynomial base


def gram_hashes(text: str, k: int = DEFAULT_K) -> np.ndarray:
    """uint64 hash per char k-gram (UTF-8 byte windows), splitmix-finalized.
    len(text_bytes) < k → empty (doc can never match — documented)."""
    b = (text or "").encode("utf-8", "replace")
    if len(b) < k:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    win = sliding_window_view(arr, k)
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(k):  # k=8 vectorized passes, wraparound mod 2^64
        h = h * _BASE + win[:, j]
    return _splitmix64(h)


def winnow_positions(h: np.ndarray, w: int = DEFAULT_W) -> np.ndarray:
    """Selected fingerprint positions: rightmost minimum of every length-w
    window over the gram hashes (the robust-winnowing tie rule), deduped.
    Fewer than w grams → the single rightmost global minimum."""
    n = h.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n < w:
        rev_arg = int(h[::-1].argmin())
        return np.array([n - 1 - rev_arg], dtype=np.int64)
    win = sliding_window_view(h, w)[:, ::-1]  # reversed → argmin = rightmost
    am = win.argmin(axis=1)
    pos = np.arange(win.shape[0], dtype=np.int64) + (w - 1 - am)
    return np.unique(pos)


def fingerprint_doc(text: str, k: int = DEFAULT_K, w: int = DEFAULT_W
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint values, byte positions) for one document."""
    h = gram_hashes(text, k)
    pos = winnow_positions(h, w)
    return h[pos], pos


def fingerprints(ds: Dataset, *, k: int = DEFAULT_K, w: int = DEFAULT_W,
                 id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Dataset → Dataset(fp:int64, doc_id, pos) — one row per selected
    fingerprint. fp is the uint64 hash viewed as int64 (cheap shuffle key)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        fps, dids, poss = [], [], []
        for did, t in zip(ids, batch[text_col].to_pylist()):
            v, p = fingerprint_doc(t, k, w)
            fps.append(v.view(np.int64))
            dids.append(np.full(v.size, did, dtype=np.int64))
            poss.append(p)
        cat = np.concatenate
        empty = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "fp": pa.array(cat(fps) if fps else empty, pa.int64()),
                id_col: pa.array(cat(dids) if dids else empty, pa.int64()),
                "pos": pa.array(cat(poss) if poss else empty, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def passage_match_pairs(
    ds: Dataset, *, k: int = DEFAULT_K, w: int = DEFAULT_W,
    min_shared: int = 2, id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int = 8, max_docs_per_fp: int = MAX_DOCS_PER_FP,
    drop_stats: Optional["ray.actor.ActorHandle"] = None,
) -> Dataset:
    """Dataset → Dataset(id_a, id_b, n_shared): doc pairs sharing
    ``min_shared`` or more DISTINCT winnowed fingerprints (id_a < id_b).
    Repeated occurrences of a fingerprint inside one doc count once."""
    configure_data_context()
    fp_rows = fingerprints(ds, k=k, w=w, id_col=id_col, text_col=text_col)
    fp_rows = fp_rows.repartition(num_blocks=num_partitions, keys=["fp"])

    def fp_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pair_key": pa.array([], pa.int64()),
             "id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64())}
        )
        if len(batch) == 0:
            return empty
        fps = batch["fp"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        # distinct (fp, doc): same passage repeated within a doc counts once
        order = np.lexsort((ids, fps))
        fps, ids = fps[order], ids[order]
        keep = np.ones(len(fps), dtype=bool)
        keep[1:] = (np.diff(fps) != 0) | (np.diff(ids) != 0)
        fps, ids = fps[keep], ids[keep]
        bounds = np.flatnonzero(np.diff(fps)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(fps)]))
        out_a, out_b = [], []
        n_skip = n_skip_members = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > max_docs_per_fp:  # hot-fingerprint guard, counted
                n_skip += 1
                n_skip_members += m
                continue
            sub = ids[s:e]  # already ascending within the fp group
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(sub[ia])
            out_b.append(sub[ib])
        if (n_skip or n_skip_members) and drop_stats is not None:
            drop_stats.add.remote(n_skip, n_skip_members)
        if not out_a:
            return empty
        a, b = np.concatenate(out_a), np.concatenate(out_b)
        pair_key = _splitmix64(
            a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ b.astype(np.uint64)
        ).view(np.int64)
        return pa.table(
            {"pair_key": pa.array(pair_key, pa.int64()),
             "id_a": pa.array(a, pa.int64()),
             "id_b": pa.array(b, pa.int64())}
        )

    pairs = fp_rows.map_batches(fp_pairs, batch_format="pyarrow",
                                batch_size=None)
    pairs = pairs.repartition(
        num_blocks=max(2, num_partitions // 2), keys=["pair_key"]
    )

    def count_pairs(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "n_shared": pa.array([], pa.int64())}
            )
        agg = (
            batch.select(["id_a", "id_b"])
            .group_by(["id_a", "id_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["id_a", "id_b", "n_shared"])
        )
        import pyarrow.compute as pc

        return agg.filter(pc.greater_equal(agg["n_shared"], min_shared))

    return pairs.map_batches(count_pairs, batch_format="pyarrow",
                             batch_size=None)


# re-export the shared counter actor under the op's own name
WinnowDropStats = LshDropStats
