"""Text deduplication family over a (id, text) table:

- exact:          md5 fingerprint → hash-partition → keep min id per digest
- n-gram Jaccard: exact word-3-gram Jaccard over all pairs of a bounded id
                  subset (the verification kernel; SQL-oracle-checkable)
- MinHash + LSH:  64-perm signatures → banded LSH buckets → candidate pairs
                  scored by signature agreement (the scale path; candidates
                  only ever co-group per bucket — no all-pairs anywhere)
- SimHash:        64-bit token-hash aggregate; near-dup = small Hamming
                  distance within LSH-style prefix buckets

All hashing is md5-derived (stable across processes — never builtin
``hash``, which is salted per process). Randomless: permutation constants
are fixed odd multipliers (splitmix-style), so outputs are reproducible.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..context import configure_data_context

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16  # 16 bands × 4 rows
_ROWS = _N_PERM // _BANDS

# fixed universal-hash constants (deterministic, no RNG at import)
_A = np.array(
    [(0x9E3779B97F4A7C15 * (i + 1)) % _MERSENNE or 1 for i in range(_N_PERM)],
    dtype=np.uint64,
)
_B = np.array(
    [(0xBF58476D1CE4E5B9 * (i + 7)) % _MERSENNE for i in range(_N_PERM)],
    dtype=np.uint64,
)


def _md5_64(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def word_ngrams(text: str, n: int = 3) -> set[tuple[str, ...]]:
    """Docs with fewer than ``n`` words have NO grams (empty set) — matching
    the SQL oracle's generate_series expression, which yields an empty list
    for them; such docs can never form a near-dup pair."""
    words = (text or "").split()
    if len(words) < n:
        return set()
    return {tuple(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    """jaccard(∅, ∅) = 0.0 (the SQL oracle's 0/0 → NULL excludes the pair;
    gram-less docs therefore never pair — pinned by the short-doc tests)."""
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    grams = word_ngrams(text, n)
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.array(
        sorted(_md5_64(" ".join(g).encode("utf-8")) for g in grams), dtype=np.uint64
    )


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """64-perm MinHash signature (uint64[64]); empty text → all MAX."""
    h = shingle_hashes(text, n)
    if h.size == 0:
        return np.full(_N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*h + b) mod p per permutation, vectorized (perm × shingle)
    vals = (h[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def band_keys(sig: np.ndarray) -> list[str]:
    keys = []
    for b in range(_BANDS):
        chunk = sig[b * _ROWS : (b + 1) * _ROWS].tobytes()
        keys.append(f"{b}:{hashlib.md5(chunk).hexdigest()[:16]}")
    return keys


def simhash64(text: str) -> int:
    toks = (text or "").split()
    if not toks:
        return 0
    hashes = np.array([_md5_64(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    # (tokens × 64) bit matrix in one vectorized shift — no per-bit Python
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    weights = (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
    return int(weights.sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------

def _keep_min_id_per_key(batch: pa.Table, key: str, id_col: str) -> pa.Table:
    import pyarrow.compute as pc

    if len(batch) <= 1:
        return batch
    idx = pc.sort_indices(batch, sort_keys=[(key, "ascending"), (id_col, "ascending")])
    batch = batch.take(idx)
    keys = batch[key].combine_chunks()
    first = np.empty(len(batch), dtype=bool)
    first[0] = True
    first[1:] = pc.not_equal(keys.slice(1), keys.slice(0, len(batch) - 1)).to_numpy(
        zero_copy_only=False
    )
    return batch.filter(pa.array(first))


def dedup_exact(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int = 8,
) -> Dataset:
    """Exact content dedup: md5(text) → hash repartition → keep min id.
    Same shuffle shape as the url dedup (stages/dedup.py) but keyed on the
    content digest, so byte-identical documents collapse across the corpus."""
    configure_data_context()

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return batch.append_column("content_fp", pa.array(fps, pa.string()))

    ds = ds.map_batches(add_fp, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: _keep_min_id_per_key(b, "content_fp", id_col),
        batch_format="pyarrow",
    )  # local combiner
    ds = ds.repartition(num_blocks=num_partitions, keys=["content_fp"])
    return ds.map_batches(
        lambda b: _keep_min_id_per_key(b, "content_fp", id_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def ngram_jaccard_pairs(
    ds: Dataset, threshold: float, id_col: str = "doc_id",
    text_col: str = "text", max_id: Optional[int] = None,
) -> Dataset:
    """EXACT all-pairs word-3-gram Jaccard over a bounded subset
    (``id < max_id``) — the verification kernel for near-dup work and the
    SQL-oracle-checkable variant. The bound is the documented scale guard:
    unbounded all-pairs is quadratic; at scale use minhash_lsh_pairs and
    feed only candidate pairs through this exact check."""
    import pyarrow.compute as pc

    if max_id is not None:
        ds = ds.map_batches(
            lambda b: b.filter(pc.less(b[id_col], max_id)), batch_format="pyarrow"
        )
    # bounded subset → single partition all-pairs (vectorized set math)
    ds = ds.repartition(1)

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sets = [word_ngrams(t) for t in batch[text_col].to_pylist()]
        order = np.argsort(np.asarray(ids))
        out_a, out_b, out_j = [], [], []
        for x in range(len(order)):
            i = order[x]
            for y in range(x + 1, len(order)):
                j = order[y]
                jac = jaccard(sets[i], sets[j])
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    # ppm int via floor: identical IEEE division on both
                    # sides → exact integer comparison with the SQL oracle
                    out_j.append(int(jac * 1e6))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard_ppm": pa.array(out_j, pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)


MAX_LSH_BUCKET = 200  # hot-bucket guard (see minhash_lsh_pairs docstring)


def minhash_lsh_pairs(
    ds: Dataset, threshold: float = 0.7, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
    max_bucket: int = MAX_LSH_BUCKET,
) -> Dataset:
    """MinHash+LSH near-dup candidates at scale:
    signature per doc (map_batches) → explode to (band_key, id, sig) rows →
    hash repartition on band_key → within-bucket pairs scored by signature
    agreement (est. Jaccard = matching perms / 64) → global pair dedup.
    Only same-bucket docs are ever compared.

    Skew guards (hot keys are THE failure mode of LSH dedup at scale):
    - empty/shingle-less docs emit NO bands (their all-MAX signatures would
      otherwise all collide into one giant bucket — run dedup_exact first
      to collapse byte-identical docs);
    - buckets larger than ``max_bucket`` are skipped entirely instead of
      generating O(n²) pairs — a bucket that hot is a degenerate-content
      cluster (boilerplate), not a near-dup candidate set; handle those
      with exact dedup on a normalized fingerprint."""
    configure_data_context()

    def sigs(batch: pa.Table) -> pa.Table:
        ids, keys, sig_bytes = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if not word_ngrams(t):
                continue  # empty-shingle guard
            sig = minhash_signature(t)
            for k in band_keys(sig):
                ids.append(i)
                keys.append(k)
                sig_bytes.append(sig.tobytes())
        return pa.table(
            {
                "band_key": pa.array(keys, pa.string()),
                "id": pa.array(ids, pa.int64()),
                "sig": pa.array(sig_bytes, pa.binary()),
            }
        )

    exploded = ds.map_batches(sigs, batch_format="pyarrow")
    exploded = exploded.repartition(num_blocks=num_partitions, keys=["band_key"])

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        import collections

        by_key: dict[str, list[tuple[int, bytes]]] = collections.defaultdict(list)
        for k, i, s in zip(
            batch["band_key"].to_pylist(),
            batch["id"].to_pylist(),
            batch["sig"].to_pylist(),
        ):
            by_key[k].append((i, s))
        out_a, out_b, out_e = [], [], []
        for members in by_key.values():
            if len(members) < 2 or len(members) > max_bucket:
                continue  # hot-bucket guard (see docstring)
            members.sort()
            for x in range(len(members)):
                ia, sa = members[x]
                va = np.frombuffer(sa, dtype=np.uint64)
                for y in range(x + 1, len(members)):
                    ib, sb = members[y]
                    if ia == ib:
                        continue
                    vb = np.frombuffer(sb, dtype=np.uint64)
                    est = float((va == vb).sum()) / _N_PERM
                    if est >= threshold:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_e.append(est)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "est_jaccard": pa.array(out_e, pa.float64()),
            }
        )

    pairs = exploded.map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None)
    # a pair can surface from several bands → dedup on (id_a, id_b)
    def add_key(b: pa.Table) -> pa.Table:
        k = [f"{a}:{c}" for a, c in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist())]
        return b.append_column("pair_key", pa.array(k, pa.string()))

    pairs = pairs.map_batches(add_key, batch_format="pyarrow")
    pairs = pairs.repartition(num_blocks=max(2, num_partitions // 2), keys=["pair_key"])
    pairs = pairs.map_batches(
        lambda b: _keep_min_id_per_key(b, "pair_key", "id_a"),
        batch_format="pyarrow",
        batch_size=None,
    )
    return pairs.drop_columns(["pair_key"])


def dedup_near_minhash(
    ds: Dataset, threshold: float = 0.7, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
) -> Dataset:
    """Near-dedup with TRANSITIVE cluster resolution: LSH candidate pairs →
    distributed connected components (ops/graph.py) → one survivor (min id)
    per component, losers removed by a hash anti-join. No loser-id set ever
    lands on the driver — safe at any duplicate fraction."""
    from .graph import connected_components, drop_by_components

    pairs = minhash_lsh_pairs(ds, threshold, id_col, text_col, num_partitions)
    comps = connected_components(pairs, num_partitions=num_partitions)
    return drop_by_components(ds, comps, id_col, num_partitions=num_partitions)


def simhash_table(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """(id, simhash_hex) per doc — fingerprint stage for Hamming near-dup."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = [simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "simhash_hex": pa.array([f"{h:016x}" for h in hs], pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_near_pairs(
    ds: Dataset, max_hamming: int = 8, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 4,
) -> Dataset:
    """SimHash near-dup pairs via 16-bit-chunk LSH: each doc lands in 4
    buckets (one per chunk); only same-bucket docs are compared. Pigeonhole
    GUARANTEES recall for Hamming ≤ 3 (4 chunks can't all be touched);
    pairs with 4 ≤ d ≤ max_hamming are found iff at least one chunk is
    untouched (high-probability for clustered bit flips, best-effort for
    spread ones — raise the chunk count for a stronger guarantee)."""
    configure_data_context()

    def explode(batch: pa.Table) -> pa.Table:
        ids, keys, hs = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            h = simhash64(t)
            for c in range(4):
                chunk = (h >> (16 * c)) & 0xFFFF
                ids.append(i)
                keys.append(f"{c}:{chunk:04x}")
                hs.append(f"{h:016x}")
        return pa.table(
            {
                "bucket": pa.array(keys, pa.string()),
                "id": pa.array(ids, pa.int64()),
                "h": pa.array(hs, pa.string()),
            }
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")
    ex = ex.repartition(num_blocks=num_partitions, keys=["bucket"])

    def pairs(batch: pa.Table) -> pa.Table:
        import collections

        by_key = collections.defaultdict(list)
        for k, i, h in zip(
            batch["bucket"].to_pylist(), batch["id"].to_pylist(),
            batch["h"].to_pylist(),
        ):
            by_key[k].append((i, int(h, 16)))
        out = {"id_a": [], "id_b": [], "hamming": []}
        for members in by_key.values():
            members.sort()
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    d = hamming64(members[x][1], members[y][1])
                    if d <= max_hamming and members[x][0] != members[y][0]:
                        out["id_a"].append(members[x][0])
                        out["id_b"].append(members[y][0])
                        out["hamming"].append(d)
        return pa.table(
            {
                "id_a": pa.array(out["id_a"], pa.int64()),
                "id_b": pa.array(out["id_b"], pa.int64()),
                "hamming": pa.array(out["hamming"], pa.int64()),
            }
        )

    p = ex.map_batches(pairs, batch_format="pyarrow", batch_size=None)

    def add_key(b: pa.Table) -> pa.Table:
        k = [f"{a}:{c}" for a, c in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist())]
        return b.append_column("pair_key", pa.array(k, pa.string()))

    p = p.map_batches(add_key, batch_format="pyarrow")
    p = p.repartition(num_blocks=2, keys=["pair_key"])
    p = p.map_batches(
        lambda b: _keep_min_id_per_key(b, "pair_key", "id_a"),
        batch_format="pyarrow", batch_size=None,
    )
    return p.drop_columns(["pair_key"])


def near_dup_verified(
    ds: Dataset, threshold: float = 0.8, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
    candidate_threshold: float = 0.5,
) -> Dataset:
    """The canonical two-stage near-dup pipeline (LSH candidates → exact
    verification), FULLY DISTRIBUTED — nothing unbounded ever lands on the
    driver:

      1. MinHash+LSH proposes candidate pairs (only same-bucket docs meet);
      2. the text table is semi-joined down to candidate ids (a hash
         shuffle of only the candidate fraction's texts);
      3. each pair picks up text_a / text_b via two hash joins;
      4. exact word-3-gram Jaccard runs inside ``map_batches`` over pairs
         only — the quadratic kernel never sees the full corpus.

    Returns a Dataset (id_a, id_b, jaccard_ppm) with exact Jaccard >=
    threshold (proven equal to the brute-force kernel by the SQL oracle)."""
    import pyarrow.compute as pc

    import ray.data

    cands = minhash_lsh_pairs(
        ds, threshold=candidate_threshold, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions,
    ).materialize()
    n_cands = cands.count()
    if n_cands == 0:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard_ppm": pa.array([], pa.int64())})
        )
    # compact away empty blocks: the join shuffle drops empty blocks before
    # its schema broadcast, which breaks sparse partitions downstream
    cands = cands.repartition(num_blocks=min(num_partitions, n_cands))

    def explode_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cid": pa.concat_arrays(
                    [batch["id_a"].combine_chunks(), batch["id_b"].combine_chunks()]
                )
            }
        )

    cand_ids = cands.map_batches(explode_ids, batch_format="pyarrow")
    texts = ds.select_columns([id_col, text_col]).join(
        cand_ids,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("cid",),
    ).materialize()
    # ≥2 rows whenever cands is non-empty; compact for the joins below
    texts = texts.repartition(num_blocks=min(num_partitions, texts.count()))

    # disjoint column names per side → no join suffix ambiguity
    texts_a = texts.map_batches(
        lambda t: pa.table({"_ja": t[id_col], "_text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    texts_b = texts.map_batches(
        lambda t: pa.table({"_jb": t[id_col], "_text_b": t[text_col]}),
        batch_format="pyarrow",
    )
    with_a = cands.join(
        texts_a,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        right_on=("_ja",),
    )
    with_ab = with_a.join(
        texts_b,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        right_on=("_jb",),
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b, t_a, t_b in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
            batch["_text_a"].to_pylist(), batch["_text_b"].to_pylist(),
        ):
            jac = jaccard(word_ngrams(t_a), word_ngrams(t_b))
            if jac >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(int(jac * 1e6))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard_ppm": pa.array(out_j, pa.int64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")
