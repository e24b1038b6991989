"""Cross-document duplicate-SPAN dedup — the ExactSubstr step (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"): find
every token k-gram whose text occurs in MORE THAN ONE document and strip
the covered token spans from each document. This is the third dedup
granularity in the engine, between whole-doc near-dup (dedup_text.py /
graph.py) and line dedup (line_dedup.py): it removes boilerplate
*passages* that cross line boundaries and sit inside otherwise-unique
documents (the canonical example is a license header or court formula
embedded mid-document).

Contract (what the DuckDB oracle recomputes, all integer):
- tokens = whitespace split of trimmed text (textstats.tokenize — the
  engine-wide token model); '' / NULL → 0 tokens;
- grams: k consecutive tokens at 0-based start positions 0..n_tokens-k;
  docs with < k tokens have no grams;
- a gram is a CROSS-DOC duplicate iff its text occurs in >= 2 distinct
  doc_ids (within-doc repetition alone does not trigger — that is
  Gopher's repetition-rule territory, ops/quality.py);
- dup_span_stats → one row per input doc: (doc_id, n_tokens, n_grams,
  n_dup_grams = this doc's gram occurrences that are cross-doc dups,
  covered_tokens = |union of [i, i+k) over those positions|);
- strip_dup_spans → (doc_id, text_stripped = uncovered tokens joined
  with ' ' in original order, n_tokens_kept, n_tokens_removed). Note the
  output is token-stream-normalized (single spaces), by contract.

Scale shape — the same two-plan pattern as line_dedup.py:
1. Dup-gram resolve (always distributed): per-batch combiner emits ONE
   (gram_hash, n_docs) row per distinct gram per batch (each doc lives in
   exactly one batch row, so per-doc-unique hashes summed globally give
   the exact distinct-doc count); one hash repartition on the 64-bit gram
   hash; vectorized per-partition sum; keep hashes with n_docs >= 2. Only
   *duplicated* grams travel further — the dup set is bounded by the
   corpus's boilerplate volume, not its token count.
2. Apply:
   - broadcast plan (dup hashes <= ``broadcast_max_hashes``): the sorted
     uint64 dup array (8 bytes/gram; the 5M default is 40 MB) is
     ``ray.put`` once and every batch re-hashes its docs and marks dup
     positions with one ``searchsorted`` — zero payload shuffle;
   - distributed plan (above the bound): explode docs to (gram_hash,
     doc_id, pos) occurrence rows, tag-union with the dup-hash rows,
     co-partition on the hash (partition-local membership — no
     Dataset.join, cf. line_dedup/graph), then tag-union the surviving
     dup positions with the original doc rows, co-partition on doc_id,
     and compute stats / strip partition-locally. Both plans are
     equality-tested against each other and the SQL oracle.

Hashing: grams are compared by a 64-bit vectorized hash (dedup_text's
word-hash cache + polynomial combine + splitmix64 finalize), not by gram
text — collisions are ~n²/2^65 (negligible below ~10^8 distinct grams;
widen to the 128-bit pair pattern of ops/incremental.py beyond that,
documented trade-off). The SQL oracle compares gram TEXT, so oracle
parity also certifies collision-freeness on the test corpus.

Behavioral lineage: the reference has no corpus-level pass at all (one
document per Lambda, src/ocr_processor/app.py:94-138); this op is part of
the engine's beyond-reference training-data surface.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .dedup_text import _POLY, _hash_words, _splitmix64
from .textstats import tokenize

DEFAULT_K = 8
BROADCAST_MAX_HASHES = 5_000_000


def gram_hashes(words: list[str], k: int) -> np.ndarray:
    """Positional uint64 hash per k-gram (index i = gram starting at token
    i). NOT deduplicated — callers needing the distinct set np.unique it."""
    if len(words) < k:
        return np.zeros(0, dtype=np.uint64)
    w = _hash_words(words)
    length = len(words) - k + 1
    with np.errstate(over="ignore"):
        g = w[:length].copy()
        for j in range(1, k):
            g = g * _POLY + w[j : length + j]
    return _splitmix64(g)


def dup_gram_hashes(
    ds: Dataset, k: int = DEFAULT_K, text_col: str = "text",
    num_partitions: int = 8,
) -> Dataset:
    """Dataset(h) of gram hashes present in >= 2 distinct docs — combiner
    → one hash shuffle → vectorized per-partition sum + filter."""
    configure_data_context()

    def combine(batch: pa.Table) -> pa.Table:
        # each doc contributes its DISTINCT gram hashes once; in-batch
        # counts of those are exact partial distinct-doc counts
        per_doc = [
            np.unique(gram_hashes(tokenize(t), k))
            for t in batch[text_col].to_pylist()
        ]
        allh = np.concatenate(per_doc) if per_doc else np.zeros(0, np.uint64)
        if allh.size == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "n_docs": pa.array([], pa.int64())})
        hs, counts = np.unique(allh, return_counts=True)
        return pa.table({"h": pa.array(hs, pa.uint64()),
                         "n_docs": pa.array(counts, pa.int64())})

    combined = ds.map_batches(combine, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["h"]
    )

    def resolve(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        agg = batch.group_by("h").aggregate([("n_docs", "sum")])
        dup = agg.filter(pc.greater_equal(agg["n_docs_sum"], 2))
        return dup.select(["h"])

    return combined.map_batches(resolve, batch_format="pyarrow",
                                batch_size=None)


def _coverage_mask(positions: np.ndarray, k: int, n_tokens: int) -> np.ndarray:
    """Boolean mask over tokens covered by any interval [p, p+k)."""
    d = np.zeros(n_tokens + 1, dtype=np.int64)
    np.add.at(d, positions, 1)
    np.add.at(d, np.minimum(positions + k, n_tokens), -1)
    return np.cumsum(d[:-1]) > 0


def _doc_rows(
    ids: list, texts: list, dup_sorted: np.ndarray, k: int, strip: bool
) -> dict[str, list]:
    """Shared per-doc kernel for both plans: membership via searchsorted
    against the SORTED dup-hash array, interval-union coverage."""
    out: dict[str, list] = {
        "n_tokens": [], "n_grams": [], "n_dup_grams": [], "covered": [],
    }
    if strip:
        out["text_stripped"] = []
    for t in texts:
        words = tokenize(t)
        g = gram_hashes(words, k)
        if g.size and dup_sorted.size:
            pos_idx = np.searchsorted(dup_sorted, g)
            pos_idx[pos_idx == dup_sorted.size] = 0
            is_dup = dup_sorted[pos_idx] == g
            dpos = np.nonzero(is_dup)[0]
        else:
            dpos = np.zeros(0, dtype=np.int64)
        mask = _coverage_mask(dpos, k, len(words))
        out["n_tokens"].append(len(words))
        out["n_grams"].append(int(g.size))
        out["n_dup_grams"].append(int(dpos.size))
        out["covered"].append(int(mask.sum()))
        if strip:
            out["text_stripped"].append(
                " ".join(w for w, m in zip(words, mask) if not m)
            )
    return out


def _emit(batch_ids: pa.Array, id_col: str, rows: dict, strip: bool) -> pa.Table:
    cols: dict[str, Any] = {
        id_col: batch_ids,
        "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
    }
    if strip:
        cols["text_stripped"] = pa.array(rows["text_stripped"], pa.string())
        cols["n_tokens_kept"] = pa.array(
            [n - c for n, c in zip(rows["n_tokens"], rows["covered"])],
            pa.int64(),
        )
        cols["n_tokens_removed"] = pa.array(rows["covered"], pa.int64())
    else:
        cols["n_grams"] = pa.array(rows["n_grams"], pa.int64())
        cols["n_dup_grams"] = pa.array(rows["n_dup_grams"], pa.int64())
        cols["covered_tokens"] = pa.array(rows["covered"], pa.int64())
    return pa.table(cols)


# per-worker cache of the deserialized dup-hash array (same pattern as
# line_dedup._DUP_CACHE — numpy uint64 IS zero-copy from plasma, but the
# hex-keyed cache spares the repeated ray.get round trip per batch)
_DUP_CACHE: dict[str, np.ndarray] = {}


def _apply_broadcast(
    ds: Dataset, dup_ref, id_col: str, text_col: str, k: int, strip: bool
) -> Dataset:
    def apply(batch: pa.Table) -> pa.Table:
        dup = _DUP_CACHE.get(dup_ref.hex())
        if dup is None:
            dup = ray.get(dup_ref)
            _DUP_CACHE.clear()
            _DUP_CACHE[dup_ref.hex()] = dup
        rows = _doc_rows(
            batch[id_col].to_pylist(), batch[text_col].to_pylist(),
            dup, k, strip,
        )
        return _emit(batch[id_col], id_col, rows, strip)

    return ds.map_batches(apply, batch_format="pyarrow")


def _apply_distributed(
    ds: Dataset, dup: Dataset, id_col: str, text_col: str, k: int,
    strip: bool, num_partitions: int,
) -> Dataset:
    """Any-scale apply: occurrence rows and dup-hash rows are tag-unioned
    and co-partitioned on the hash; surviving dup POSITIONS are then
    tag-unioned with the original docs and co-partitioned on the doc id,
    where the same per-doc kernel runs with a partition-local dup set of
    exactly that doc's dup positions (encoded back as that doc's gram
    hashes at those positions would be — instead we pass positions
    directly via a per-doc position mask)."""

    def explode(batch: pa.Table) -> pa.Table:
        o_id, o_pos, o_h = [], [], []
        id_type = batch.schema.field(id_col).type
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            g = gram_hashes(tokenize(t), k)
            if g.size:
                o_id.extend([did] * g.size)
                o_pos.extend(range(g.size))
                o_h.append(g)
        h = (np.concatenate(o_h) if o_h else np.zeros(0, np.uint64))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "occ_id": pa.array(o_id, id_type),
                "occ_pos": pa.array(o_pos, pa.int64()),
                "side": pa.array([0] * len(o_id), pa.int8()),
            }
        )

    occ = ds.map_batches(explode, batch_format="pyarrow")
    id_type = ds.schema().base_schema.field(id_col).type

    def tag_dup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "h": batch["h"],
                "occ_id": pa.array([None] * n, id_type),
                "occ_pos": pa.array([-1] * n, pa.int64()),
                "side": pa.array([1] * n, pa.int8()),
            }
        )

    unioned = occ.union(dup.map_batches(tag_dup, batch_format="pyarrow"))
    unioned = unioned.repartition(num_blocks=num_partitions, keys=["h"])

    def decide(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        is_dup_row = pc.equal(batch["side"], 1)
        dup_h = np.unique(
            batch.filter(is_dup_row)["h"].to_numpy(zero_copy_only=False)
        )
        o = batch.filter(pc.invert(is_dup_row))
        oh = o["h"].to_numpy(zero_copy_only=False)
        if dup_h.size and oh.size:
            idx = np.searchsorted(dup_h, oh)
            idx[idx == dup_h.size] = 0
            keep = dup_h[idx] == oh
        else:
            keep = np.zeros(oh.size, dtype=bool)
        kept = o.filter(pa.array(keep))
        return kept.select(["occ_id", "occ_pos"])

    dpos = unioned.map_batches(decide, batch_format="pyarrow",
                               batch_size=None)

    # tag-union the dup positions with the doc rows, co-partition on id
    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "occ_id": batch[id_col],
                "occ_pos": pa.array([-1] * batch.num_rows, pa.int64()),
                "doc_text": batch[text_col],
                "side": pa.array([0] * batch.num_rows, pa.int8()),
            }
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "occ_id": batch["occ_id"],
                "occ_pos": batch["occ_pos"],
                "doc_text": pa.array([None] * batch.num_rows, pa.string()),
                "side": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    docs = ds.map_batches(tag_docs, batch_format="pyarrow")
    merged = docs.union(dpos.map_batches(tag_pos, batch_format="pyarrow"))
    merged = merged.repartition(num_blocks=num_partitions, keys=["occ_id"])

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        is_doc = pc.equal(batch["side"], 0)
        dtbl = batch.filter(is_doc)
        ptbl = batch.filter(pc.invert(is_doc))
        pos_by_id: dict[Any, list[int]] = {}
        for did, p in zip(ptbl["occ_id"].to_pylist(),
                          ptbl["occ_pos"].to_pylist()):
            pos_by_id.setdefault(did, []).append(p)
        rows: dict[str, list] = {
            "n_tokens": [], "n_grams": [], "n_dup_grams": [], "covered": [],
        }
        if strip:
            rows["text_stripped"] = []
        for did, t in zip(dtbl["occ_id"].to_pylist(),
                          dtbl["doc_text"].to_pylist()):
            words = tokenize(t)
            n_grams = max(0, len(words) - k + 1) if len(words) >= k else 0
            dpos_l = np.array(sorted(pos_by_id.get(did, [])), dtype=np.int64)
            mask = _coverage_mask(dpos_l, k, len(words))
            rows["n_tokens"].append(len(words))
            rows["n_grams"].append(n_grams)
            rows["n_dup_grams"].append(int(dpos_l.size))
            rows["covered"].append(int(mask.sum()))
            if strip:
                rows["text_stripped"].append(
                    " ".join(w for w, m in zip(words, mask) if not m)
                )
        return _emit(dtbl["occ_id"], id_col, rows, strip)

    return merged.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def _run(
    ds: Dataset, id_col: str, text_col: str, k: int, strip: bool,
    num_partitions: int, broadcast_max_hashes: int, plan: str,
) -> Dataset:
    configure_data_context()
    dup = dup_gram_hashes(ds, k, text_col, num_partitions).materialize()
    if plan not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"unknown plan {plan!r}")
    use_broadcast = plan == "broadcast" or (
        plan == "auto" and dup.count() <= broadcast_max_hashes
    )
    if use_broadcast:
        # bounded by contract: dup hashes <= broadcast_max_hashes
        parts = [
            pa.table(b)["h"].to_numpy(zero_copy_only=False)
            for b in dup.iter_batches(batch_format="pyarrow")
        ]
        dup_sorted = np.sort(
            np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        )
        dup_ref = ray.put(dup_sorted)
        return _apply_broadcast(ds, dup_ref, id_col, text_col, k, strip)
    return _apply_distributed(ds, dup, id_col, text_col, k, strip,
                              num_partitions)


def dup_span_stats(
    ds: Dataset, k: int = DEFAULT_K, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
    broadcast_max_hashes: int = BROADCAST_MAX_HASHES, plan: str = "auto",
) -> Dataset:
    """Per-doc cross-document duplicate-span accounting → Dataset(id_col,
    n_tokens, n_grams, n_dup_grams, covered_tokens)."""
    return _run(ds, id_col, text_col, k, False, num_partitions,
                broadcast_max_hashes, plan)


def strip_dup_spans(
    ds: Dataset, k: int = DEFAULT_K, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
    broadcast_max_hashes: int = BROADCAST_MAX_HASHES, plan: str = "auto",
) -> Dataset:
    """ExactSubstr removal → Dataset(id_col, text_stripped, n_tokens,
    n_tokens_kept, n_tokens_removed)."""
    return _run(ds, id_col, text_col, k, True, num_partitions,
                broadcast_max_hashes, plan)


def sql_dup_span_stats(
    k: int = DEFAULT_K, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB recompute of dup_span_stats over gram TEXT (not hashes)."""
    return f"""
        WITH d AS (
          SELECT {id_col},
                 CASE WHEN trim(coalesce({text_col}, '')) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim({text_col}), '\\s+')
                 END AS ts
          FROM {table}
        ),
        grams AS (
          SELECT {id_col}, CAST(r.i AS BIGINT) AS i,
                 array_to_string(ts[r.i+1:r.i+{k}], ' ') AS g
          FROM d, LATERAL (SELECT unnest(range(0, len(ts)-{k}+1)) AS i) r
          WHERE len(ts) >= {k}
        ),
        dup AS (
          SELECT g FROM grams GROUP BY g
          HAVING count(DISTINCT {id_col}) >= 2
        ),
        dpos AS (SELECT {id_col}, i FROM grams JOIN dup USING (g)),
        cov AS (
          SELECT {id_col}, count(DISTINCT p.pos) AS covered
          FROM dpos, LATERAL (SELECT unnest(range(i, i+{k})) AS pos) p
          GROUP BY {id_col}
        ),
        nd AS (SELECT {id_col}, count(*) AS n_dup FROM dpos GROUP BY {id_col}),
        ng AS (SELECT {id_col}, count(*) AS n FROM grams GROUP BY {id_col})
        SELECT d.{id_col},
               CAST(len(d.ts) AS BIGINT) AS n_tokens,
               CAST(coalesce(ng.n, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(nd.n_dup, 0) AS BIGINT) AS n_dup_grams,
               CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens
        FROM d
        LEFT JOIN ng USING ({id_col})
        LEFT JOIN nd USING ({id_col})
        LEFT JOIN cov USING ({id_col})
    """


def sql_strip_dup_spans(
    k: int = DEFAULT_K, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB recompute of strip_dup_spans (token-stream reassembly)."""
    return f"""
        WITH d AS (
          SELECT {id_col},
                 CASE WHEN trim(coalesce({text_col}, '')) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim({text_col}), '\\s+')
                 END AS ts
          FROM {table}
        ),
        grams AS (
          SELECT {id_col}, CAST(r.i AS BIGINT) AS i,
                 array_to_string(ts[r.i+1:r.i+{k}], ' ') AS g
          FROM d, LATERAL (SELECT unnest(range(0, len(ts)-{k}+1)) AS i) r
          WHERE len(ts) >= {k}
        ),
        dup AS (
          SELECT g FROM grams GROUP BY g
          HAVING count(DISTINCT {id_col}) >= 2
        ),
        dpos AS (SELECT {id_col}, i FROM grams JOIN dup USING (g)),
        covpos AS (
          SELECT DISTINCT {id_col}, p.pos
          FROM dpos, LATERAL (SELECT unnest(range(i, i+{k})) AS pos) p
        ),
        tok AS (
          SELECT {id_col}, CAST(r.i AS BIGINT) AS pos, ts[r.i+1] AS tok
          FROM d, LATERAL (SELECT unnest(range(0, len(ts))) AS i) r
        ),
        kept AS (
          SELECT t.{id_col},
                 string_agg(t.tok, ' ' ORDER BY t.pos) AS text_stripped,
                 count(*) AS n_kept
          FROM tok t
          LEFT JOIN covpos c
            ON t.{id_col} = c.{id_col} AND t.pos = c.pos
          WHERE c.pos IS NULL
          GROUP BY t.{id_col}
        )
        SELECT d.{id_col},
               coalesce(kept.text_stripped, '') AS text_stripped,
               CAST(len(d.ts) AS BIGINT) AS n_tokens,
               CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_tokens_kept,
               CAST(len(d.ts) - coalesce(kept.n_kept, 0) AS BIGINT)
                 AS n_tokens_removed
        FROM d LEFT JOIN kept USING ({id_col})
    """
