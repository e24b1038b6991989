"""Mergeable approximate-quantile sketch — deterministic merge-and-prune
(Manku, Rajagopalan & Lindsay, SIGMOD'98; the deterministic ancestor of
KLL). Completes the engine's sketch family (HLL count-distinct, count-min
heavy hitters) for the one statistic the exact ops can't do at scale:
quantiles over UNBOUNDED / real-valued columns, where the exact
histogram walk (ops/corpus_stats.token_count_quantiles — needs a bounded
discrete domain) does not apply.

Structure: a list of levels; level L holds at most one sorted buffer of
<= k values, each representing 2^L original values. Insert fills level
0; when two buffers meet at a level they COMPACT: merge-sort, then take
every 2nd element, weight doubling. The compaction offset is FIXED at 0
(deterministic — the engine's no-RNG rule; KLL's random offset only
improves the constant). Merging two sketches = merging their level
lists, then compacting bottom-up. Rank error is bounded by
sum over compactions of 2^L <= ~N log(N/k) / k in the worst case
(the classic MRL bound shape); the pytest certifies measured relative
rank error <= (2/k) * log2(n/k + 2) — the MRL shape with the 2x constant
the deterministic offset costs — on uniform, zipf-skewed, sorted and
reversed inputs, and exactness when n <= k (no compaction ever happens).

Determinism/merge caveat (documented, not hidden): compaction is
deterministic given buffer CONTENTS, so a different partitioning yields
a (slightly) different — equally valid — sketch. The driver fold sorts
per-batch sketches by their serialized bytes before merging, so a given
set of batch sketches always folds to the same result; rank-error
certification, not bit-identity, is the contract (like knn_ivf /
approx_distinct_users).

Scale shape: per-batch sketch rows (each O(k log(n/k)) floats) -> driver
fold of n_batches fixed-ish-size sketches — the HLL/CMS pattern; nothing
value-sized ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..context import configure_data_context

DEFAULT_K = 512


class QuantileSketch:
    """levels[L] = sorted float64 array whose entries each stand for
    2^L original values (empty array = vacant level)."""

    def __init__(self, k: int = DEFAULT_K):
        self.k = k
        self.levels: list[np.ndarray] = []
        self.n = 0

    # -- construction ------------------------------------------------
    def insert_batch(self, values: np.ndarray) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.n += int(vals.size)
        for i in range(0, vals.size, self.k):
            self._add_buffer(np.sort(vals[i : i + self.k]), 0)

    def _add_buffer(self, buf: np.ndarray, level: int) -> None:
        while True:
            while len(self.levels) <= level:
                self.levels.append(np.empty(0))
            if self.levels[level].size == 0:
                self.levels[level] = buf
                return
            # compact the resident buffer with the incoming one
            merged = np.sort(np.concatenate([self.levels[level], buf]))
            self.levels[level] = np.empty(0)
            buf = merged[::2]  # fixed offset 0 (deterministic)
            level += 1

    # -- merge (associative up to compaction order; see docstring) ---
    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        out = QuantileSketch(self.k)
        out.n = self.n + other.n
        for L in range(max(len(self.levels), len(other.levels))):
            for src in (self, other):
                if L < len(src.levels) and src.levels[L].size:
                    out._add_buffer(src.levels[L], L)
        return out

    # -- query --------------------------------------------------------
    def quantile(self, q: float) -> float:
        vals, wts = [], []
        for L, buf in enumerate(self.levels):
            if buf.size:
                vals.append(buf)
                wts.append(np.full(buf.size, 1 << L, dtype=np.int64))
        if not vals:
            return float("nan")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        target = max(0, int(np.ceil(q * total)) - 1)  # quantile_disc rank
        idx = int(np.searchsorted(cum, target + 1))
        return float(v[min(idx, v.size - 1)])

    # -- serialization (Arrow transport) ------------------------------
    def to_bytes(self) -> bytes:
        import struct

        parts = [struct.pack("<qqq", self.k, self.n, len(self.levels))]
        for buf in self.levels:
            parts.append(struct.pack("<q", buf.size))
            parts.append(buf.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "QuantileSketch":
        import struct

        k, n, n_levels = struct.unpack_from("<qqq", raw, 0)
        off = 24
        sk = cls(k)
        sk.n = n
        for _ in range(n_levels):
            (size,) = struct.unpack_from("<q", raw, off)
            off += 8
            sk.levels.append(
                np.frombuffer(raw, dtype=np.float64, count=size,
                              offset=off).copy()
            )
            off += 8 * size
        return sk


def approx_quantiles(
    ds: Dataset, col: str, qs=(0.5, 0.9, 0.99), k: int = DEFAULT_K,
) -> dict:
    """Distributed approximate quantiles of a numeric column: one sketch
    per batch, deterministic driver fold (sketches sorted by serialized
    bytes before merging). Returns {"p50": ..., "n": ..., "k": k}."""
    configure_data_context()

    def per_batch(batch: pa.Table) -> pa.Table:
        sk = QuantileSketch(k)
        sk.insert_batch(
            np.asarray(batch[col].to_pylist(), dtype=np.float64)
        )
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary())})

    raws = []
    for b in ds.map_batches(per_batch,
                            batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        raws.extend(b["sketch"].to_pylist())
    raws.sort()
    merged = QuantileSketch(k)
    for raw in raws:
        merged = merged.merge(QuantileSketch.from_bytes(raw))
    out = {f"p{int(q * 100)}": merged.quantile(q) for q in qs}
    out["n"] = merged.n
    out["k"] = k
    return out
