"""Benchmark decontamination: flag (and drop) corpus documents that contain
any word-n-gram from a benchmark/eval set — the standard pre-training
hygiene pass that keeps eval questions out of training data.

Scale shape: the benchmark side is SMALL (thousands of eval items) and the
corpus side is the 100 TB stream, so this is a broadcast-membership scan,
never a join: the benchmark's n-gram hashes are built once on the driver
(sorted unique uint64, a few MB at most), shipped to the object store with
``ray.put``, and every ``map_batches`` task does a vectorized
``np.searchsorted`` membership test against the shared read-only array —
zero shuffle, zero per-batch re-shipping, linear scan cost.

The n-gram hash kernel is ops/dedup_text.shingle_hashes (vectorized
polynomial combine over cached word hashes + splitmix64 finalize), so a
contamination hit here and a near-dup shingle there agree on what an
n-gram is. Docs with fewer than ``n`` words have no grams and can never be
flagged (same contract as the near-dup family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup_text import shingle_hashes

DEFAULT_N = 8  # token n-gram size; 8-13 is the common decontamination range


def benchmark_ngram_hashes(texts: list[str], n: int = DEFAULT_N) -> np.ndarray:
    """Sorted unique uint64 hashes of every word-n-gram in the benchmark
    texts. Bounded by benchmark size (small side by contract)."""
    parts = [shingle_hashes(t, n) for t in texts]
    parts = [p for p in parts if p.size]
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def _contamination_batch(batch: pa.Table, ref: np.ndarray, n: int,
                         text_col: str) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    texts = batch.column(text_col).to_pylist()
    n_hits = np.zeros(len(texts), dtype=np.int64)
    n_grams = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = shingle_hashes(t, n)
        n_grams[i] = h.size
        if h.size and ref.size:
            pos = np.searchsorted(ref, h)
            pos[pos == ref.size] = 0  # out-of-range probes can't match slot 0 twice
            n_hits[i] = int(np.count_nonzero(ref[pos] == h))
    return batch, n_grams, n_hits


def scan_contamination(ds, bench_texts: list[str], *, n: int = DEFAULT_N,
                       id_col: str = "doc_id", text_col: str = "text"):
    """Dataset → Dataset(id_col, n_grams, n_contaminated, contaminated):
    per-document count of benchmark n-grams found."""
    ref_handle = ray.put(benchmark_ngram_hashes(bench_texts, n))

    def check(batch: pa.Table) -> pa.Table:
        ref = ray.get(ref_handle)
        batch, n_grams, n_hits = _contamination_batch(batch, ref, n, text_col)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(n_grams),
            "n_contaminated": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })

    return ds.map_batches(check, batch_format="pyarrow")


def drop_contaminated(ds, bench_texts: list[str], *, n: int = DEFAULT_N,
                      text_col: str = "text"):
    """Dataset → Dataset with contaminated documents removed, filtering
    inside the same scan batch (no second pass, no shuffle)."""
    ref_handle = ray.put(benchmark_ngram_hashes(bench_texts, n))

    def keep_clean(batch: pa.Table) -> pa.Table:
        ref = ray.get(ref_handle)
        batch, _, n_hits = _contamination_batch(batch, ref, n, text_col)
        return batch.filter(pa.array(n_hits == 0))

    return ds.map_batches(keep_clean, batch_format="pyarrow")
