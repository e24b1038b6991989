"""Fixed-size Bloom filter for bounded-memory membership broadcast.

The scale problem this solves: broadcast-filter patterns (dedup winner maps,
loser-id sets, candidate-id sets) are only safe while the exact set fits the
driver / a broadcast object. A Bloom filter caps that state at ``m_bits/8``
bytes (128 KB at the default 2^20 bits) REGARDLESS of how many members the
set has — at the price of a false-positive rate, so every user of this
module must pair the filter with an exact resolve of the "possible member"
subset (e.g. a shuffled keep-first, or an exact anti-join of only the hits).

Build is distributed: each block folds its values into a local packed
bitmap; the driver ORs one bitmap per block (bounded by block count, never
by row count). Hashing is vectorized siphash+splitmix double-hashing for strings and splitmix64
for int64 ids — deterministic across processes (never builtin ``hash``).

No false negatives, ever: a value that was added always tests positive.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

DEFAULT_M_BITS = 1 << 20  # 128 KB packed; ~0.1% fpr at 50k members, k=4
DEFAULT_K = 4

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
# siphash key pinned explicitly (exactly 16 bytes, pandas contract)
_BLOOM_HASH_KEY = "ocr_sam_bloom_16"


def _positions_str(values: list, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for string values. Base hash is pandas'
    vectorized siphash with an EXPLICIT hash key (pinned below, so the
    layout no longer rides on pandas' default-key choice — deterministic
    across processes and pandas versions, unlike builtin ``hash``);
    h1/h2 double-hashing strides are splitmix64 finalizes of it.
    Replaces the earlier per-string crc32 Python loop — same filter
    semantics (no false negatives), different (still deterministic) bit
    layout. NOTE: bitmaps are build-and-probe WITHIN one run by
    contract; do not persist them across code versions — any change to
    the key or mix silently voids membership guarantees."""
    import pandas as pd

    arr = np.array(["" if v is None else v for v in values], dtype=object)
    base = pd.util.hash_array(
        arr, categorize=False, hash_key=_BLOOM_HASH_KEY
    )  # uint64, C-speed

    def _mix(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            z = x + _GOLDEN
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return z ^ (z >> np.uint64(31))

    with np.errstate(over="ignore"):
        h1 = _mix(base)
        h2 = _mix(base ^ _GOLDEN) | np.uint64(1)  # odd → full-period stride
        out = np.empty((len(values), k), dtype=np.int64)
        for j in range(k):
            out[:, j] = ((h1 + np.uint64(j) * h2) % np.uint64(m_bits)).astype(
                np.int64
            )
    return out


def _positions_int(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for int64 values — fully vectorized splitmix64."""
    x = values.astype(np.uint64)
    pos = np.empty((len(values), k), dtype=np.int64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for j in range(k):
            z = x + np.uint64(j + 1) * _GOLDEN
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            pos[:, j] = (z % np.uint64(m_bits)).astype(np.int64)
    return pos


def _positions(values, m_bits: int, k: int) -> np.ndarray:
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        return _positions_int(values, m_bits, k)
    return _positions_str(list(values), m_bits, k)


def _column_values(col: pa.ChunkedArray):
    if pa.types.is_integer(col.type):
        return col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    return col.to_pylist()


def bloom_from_values(values, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> np.ndarray:
    """Packed uint64 bitmap (m_bits/64 words) with all ``values`` added."""
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(values) == 0:
        return bits
    pos = _positions(values, m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return bits


def bloom_contains(bits: np.ndarray, values, m_bits: int = DEFAULT_M_BITS,
                   k: int = DEFAULT_K) -> np.ndarray:
    """Vectorized membership mask: True = POSSIBLY a member (fp allowed),
    False = definitely not (no false negatives)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(values, m_bits, k)
    hit = (bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return (hit == 1).all(axis=1)


def bloom_from_dataset(ds, col: str, m_bits: int = DEFAULT_M_BITS,
                       k: int = DEFAULT_K) -> np.ndarray:
    """Distributed build: one packed bitmap per block, OR-merged on the
    driver. Driver state = n_blocks × m_bits/8 bytes — bounded by the block
    count, never by the member count."""

    def block_bloom(batch: pa.Table) -> pa.Table:
        bits = bloom_from_values(_column_values(batch[col]), m_bits, k)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in ds.map_batches(
        block_bloom, batch_format="pyarrow", batch_size=None
    ).take_all():
        merged |= np.frombuffer(row["bits"], dtype=np.uint64)
    return merged
