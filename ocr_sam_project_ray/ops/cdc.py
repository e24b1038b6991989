"""Content-defined chunking (CDC) dedup — shift-robust sub-document
redundancy detection. Fixed-size chunking breaks when one byte is
inserted (every later chunk hash changes); CDC cuts where a rolling
hash of the LOCAL bytes hits a mask (Muthitacharoen et al., LBFS SOSP
2001; FastCDC ATC 2016), so an insertion disturbs only the chunks it
touches and the rest of the document still deduplicates. This is the
storage-layer complement to the text-level families already in the
engine (line/span/passage dedup) — it works on raw bytes, needs no
token model, and catches re-crawled pages whose templates shifted.

Kernel (reuses ops/winnow.gram_hashes — the vectorized k-byte rolling
polynomial + splitmix64 finalize; zero Python loops over byte
positions): candidate cut after byte i when hash(window ending at i) &
(2^mask_bits − 1) == 0 → expected chunk ≈ 2^mask_bits bytes; a bounded
pass over CANDIDATES (≈ n/2^mask_bits, not n) enforces
[min_size, max_size]. Chunks tile the byte string exactly.

Dedup semantics: occurrences are ordered by (doc_id, chunk position);
every occurrence of a chunk hash beyond the corpus-wide first is a
duplicate (keep-first, deterministic — same rule as exact doc dedup).
Scale shape: payload-free (chunk_h, doc_id, pos) rows → ONE hash-key
repartition → partition-local first-occurrence marking (a hash's rows
are co-partitioned by construction) → per-doc groupby fold.

Not SQL-expressible at reasonable cost (per-byte rolling hash +
stateful cut placement) → rows-only driver query; pytest certifies
determinism, tiling, size bounds, shift robustness (prefix insertion
preserves the tail chunks), planted-duplicate recall, and partition
invariance (tests/test_cdc.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .winnow import gram_hashes

CDC_K = 16          # rolling-window width (bytes)
CDC_MASK_BITS = 6   # expected chunk ~64 bytes
CDC_MIN = 32
CDC_MAX = 256


def chunk_spans(
    text: str,
    k: int = CDC_K,
    mask_bits: int = CDC_MASK_BITS,
    min_size: int = CDC_MIN,
    max_size: int = CDC_MAX,
) -> list[tuple[int, int]]:
    """[(start, end) byte spans] tiling the utf-8 bytes of ``text``.
    Cut candidates are mask hits of the k-byte rolling hash; the
    min/max walk runs over candidates only (bounded, ~n/2^mask_bits)."""
    b = (text or "").encode("utf-8", "replace")
    n = len(b)
    if n == 0:
        return []
    h = gram_hashes(text, k=k)  # h[j] covers bytes [j, j+k)
    mask = np.uint64((1 << mask_bits) - 1)
    # cut AFTER byte j+k-1  → cut position j+k
    cand = (np.nonzero((h & mask) == np.uint64(0))[0] + k) if len(h) else \
        np.zeros(0, dtype=np.int64)
    spans = []
    start = 0
    ci = 0
    while start < n:
        lo, hi = start + min_size, start + max_size
        ci = int(np.searchsorted(cand, lo))
        if ci < len(cand) and cand[ci] <= hi and cand[ci] < n:
            end = int(cand[ci])
        else:
            end = min(hi, n)
        spans.append((start, end))
        start = end
    return spans


def _chunk_hash64(data: bytes) -> int:
    """Signed-int64 chunk content hash (md5 prefix — chunk-level, not
    per-byte; chunk count is bounded by len/min_size)."""
    d = hashlib.md5(data).digest()
    return int.from_bytes(d[:8], "big", signed=True)


def doc_chunk_rows(text: str, doc_id: int) -> tuple[list, list, list]:
    """(hashes, doc_ids, positions) for one document."""
    b = (text or "").encode("utf-8", "replace")
    spans = chunk_spans(text)
    hs = [_chunk_hash64(b[s:e]) for s, e in spans]
    return hs, [doc_id] * len(hs), list(range(len(hs)))


def cdc_chunk_stats(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int = 8,
) -> Dataset:
    """Per-doc CDC dedup accounting: (doc_id, n_chunks, n_dup_chunks,
    dup_ratio_ppm). A chunk occurrence is dup when the same chunk hash
    already occurred at a smaller (doc_id, pos) anywhere in the corpus."""
    configure_data_context()

    def explode(batch: pa.Table) -> pa.Table:
        hs, dids, poss = [], [], []
        ids = batch[id_col].to_pylist()
        for did, tx in zip(ids, batch[text_col].to_pylist()):
            h, d, p = doc_chunk_rows(tx, did)
            hs += h
            dids += d
            poss += p
        return pa.table(
            {
                "chunk_h": pa.array(hs, pa.int64()),
                "doc_id": pa.array(dids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
            }
        )

    rows = ds.map_batches(explode, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["chunk_h"]
    )

    def mark_dups(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chunks": pa.array([], pa.int64()),
                    "n_dup_chunks": pa.array([], pa.int64()),
                }
            )
        h = np.asarray(batch["chunk_h"].to_pylist(), dtype=np.int64)
        d = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        p = np.asarray(batch["pos"].to_pylist(), dtype=np.int64)
        order = np.lexsort((p, d, h))  # per hash: (doc_id, pos) ascending
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        dup = (~first).astype(np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(d[order], pa.int64()),
                "one": pa.array(np.ones(len(hs), dtype=np.int64)),
                "dup": pa.array(dup, pa.int64()),
            }
        )
        agg = t.group_by("doc_id").aggregate([("one", "sum"), ("dup", "sum")])
        return agg.rename_columns(["doc_id", "n_chunks", "n_dup_chunks"])

    from ray.data.aggregate import Sum

    # batch_size=None: a chunk hash's rows are complete within one block
    per_doc = (
        rows.map_batches(mark_dups, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id", num_partitions=4)
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_dup_chunks", alias_name="n_dup_chunks"),
        )
    )

    def ratio(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_chunks"].to_pylist(), dtype=np.int64)
        dup = np.asarray(batch["n_dup_chunks"].to_pylist(), dtype=np.int64)
        ppm = np.zeros(len(n), dtype=np.int64)
        nz = n > 0
        ppm[nz] = (dup[nz] * 1_000_000) // n[nz]
        return batch.append_column("dup_ratio_ppm", pa.array(ppm, pa.int64()))

    return per_doc.map_batches(ratio, batch_format="pyarrow")
