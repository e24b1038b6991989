"""Mergeable sketches: HyperLogLog approximate count-distinct.

The canonical sketch pattern for Ray Data (guide: "emit one serialized
sketch per batch and merge them in a second, tiny stage — sketches are
designed to be mergeable"): every batch reduces to a fixed 2^p-byte
register array, merge = elementwise max (associative + commutative, so the
reduction order the streaming executor picks never changes the result).

Deterministic: md5-derived 64-bit hashes (never the salted builtin hash).
Standard HLL estimator with linear-counting small-range correction;
p=12 → 4096 registers → ~1.6% relative standard error.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

P = 12
M = 1 << P                # registers
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(value) -> int:
    return int.from_bytes(
        hashlib.md5(str(value).encode("utf-8")).digest()[:8], "big"
    )


def hll_sketch(values) -> np.ndarray:
    """Register array (uint8[M]) for an iterable of values."""
    regs = np.zeros(M, dtype=np.uint8)
    for v in values:
        h = _hash64(v)
        idx = h >> (64 - P)
        rest = h & ((1 << (64 - P)) - 1)
        # rank = position of leftmost 1-bit in the remaining 52 bits
        rank = (64 - P) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros > 0:
        return M * np.log(M / zeros)  # linear counting, small range
    return float(est)


def approx_count_distinct(ds: Dataset, col: str) -> float:
    """Distributed approximate distinct count: one sketch per batch
    (map_batches), merged in a tiny final reduction (n_batches × 4 KB)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        regs = hll_sketch(batch[col].to_pylist())
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(per_batch, batch_format="pyarrow")
    merged = np.zeros(M, dtype=np.uint8)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s in b["sketch"].to_pylist():
            merged = hll_merge(merged, np.frombuffer(s, dtype=np.uint8))
    return hll_estimate(merged)
