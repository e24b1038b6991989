"""Cross-snapshot incremental dedup — drop documents from a NEW crawl whose
exact content already exists in a PRIOR corpus snapshot (the monthly
Common-Crawl ingest pattern: each new snapshot is mostly re-crawls, and
training corpora must not re-admit them).

Scale shape (both sides are corpus-sized — neither fits a driver set):
1. both sides reduce to payload-free fingerprint rows inside
   ``map_batches``: (id, fp_hi, fp_lo) — the 128-bit content md5 split into
   two int64 join keys (64-bit keys alone would birthday-collide at
   10^12 docs; 128 bits won't);
2. BLOOM ROUTE (optional, default on): a fixed-size bitmap of snapshot
   fingerprints is built distributed (ops/bloom, block-bitmap OR-merge)
   and broadcast once via ``ray.put``; new docs that MISS are definitely
   novel and skip the join entirely — only possible-dup candidates
   (typically a few % of the crawl + the false-positive rate) reach the
   shuffle. No false negatives: a real dup always hits the filter;
3. candidates SEMI-join the snapshot fingerprints with the native hash
   ``Dataset.join(left_semi)`` on (fp_hi, fp_lo) → the exact dropped-id
   set — bloom false positives die here, so the result is EXACT;
4. loser removal mirrors ops/graph.drop_by_components: ≤ ``broadcast_max``
   dropped ids → one broadcast ``pc.is_in`` filter (zero payload shuffle);
   above → hash left_anti join.

Oracle: the whole op is ANSI-SQL (NOT EXISTS on text equality) — see the
``dedup_incremental`` driver query.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..context import configure_data_context
from .bloom import DEFAULT_K, DEFAULT_M_BITS, bloom_contains, bloom_from_dataset

BROADCAST_DROP_MAX = 5_000_000  # ids; ~40 MB broadcast upper bound


def _fp_pair(texts: list) -> np.ndarray:
    """md5 of each text split into two little-endian int64s — the
    16-byte fingerprint every snapshot artifact in this module shares
    (the per-fragment urlfp sidecars persist exactly these columns)."""
    digest = b"".join(
        hashlib.md5((t or "").encode("utf-8")).digest() for t in texts
    )
    return (
        np.frombuffer(digest, dtype="<u8").reshape(-1, 2)
        if texts else np.zeros((0, 2), dtype="<u8")
    )


def _fp_table(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    fp = _fp_pair(batch[text_col].to_pylist())
    return pa.table(
        {
            id_col: batch[id_col],
            "fp_hi": pa.array(fp[:, 0].astype(np.int64), pa.int64()),
            "fp_lo": pa.array(fp[:, 1].astype(np.int64), pa.int64()),
        }
    )


def fingerprints_only(ds: Dataset, text_col: str) -> Dataset:
    """ds → Dataset(fp_hi, fp_lo): the payload-free 16-byte/row snapshot
    form ``dedup_against_snapshot(snapshot_is_fp=True)`` consumes, and
    the schema of the ingest urlfp sidecars (pipelines/checkpoint.py)."""

    def fp_only(batch: pa.Table) -> pa.Table:
        fp = _fp_pair(batch[text_col].to_pylist())
        return pa.table(
            {
                "fp_hi": pa.array(fp[:, 0].astype(np.int64), pa.int64()),
                "fp_lo": pa.array(fp[:, 1].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fp_only, batch_format="pyarrow")


def dedup_against_snapshot(
    new_ds: Dataset,
    snapshot_ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    use_bloom: bool = True,
    m_bits: int = DEFAULT_M_BITS,
    broadcast_max: int = BROADCAST_DROP_MAX,
    snapshot_is_fp: bool = False,
) -> Dataset:
    """``new_ds`` minus documents whose exact text already appears in
    ``snapshot_ds`` (all columns of ``new_ds`` preserved).

    ``snapshot_is_fp=True`` declares the snapshot ALREADY fingerprinted
    — a (fp_hi, fp_lo) Dataset such as ``fingerprints_only`` output or
    the ingest urlfp sidecars — so the snapshot side skips hashing
    entirely and only 16-byte rows are ever read for it."""
    configure_data_context()

    def fp_of(ds: Dataset) -> Dataset:
        return ds.map_batches(
            lambda b: _fp_table(b, id_col, text_col), batch_format="pyarrow"
        )

    # materialize the snapshot fingerprints ONCE: they are consumed twice
    # (bloom build + semi-join) and are payload-free 24-byte rows; this also
    # makes the empty-snapshot early-out free
    snap_fp = (
        snapshot_ds if snapshot_is_fp else fp_of(snapshot_ds)
    ).materialize()
    if snap_fp.count() == 0:
        return new_ds
    new_fp = fp_of(new_ds)

    if use_bloom:
        bits_ref = ray.put(bloom_from_dataset(snap_fp, "fp_hi", m_bits=m_bits))

        def candidates_only(batch: pa.Table) -> pa.Table:
            bits = ray.get(bits_ref)
            vals = batch["fp_hi"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            return batch.filter(
                pa.array(bloom_contains(bits, vals, m_bits=m_bits))
            )

        new_fp = new_fp.map_batches(candidates_only, batch_format="pyarrow")

    # SEMI-join via the engine's tag → union → key-repartition pattern
    # (as-of join shape): one hash shuffle of 25-byte rows co-locates every
    # fp on both sides, then the membership test is a vectorized in-block
    # np.isin over (fp_hi, fp_lo) pairs. (Dataset.join is avoided here: its
    # aggregator rejects the schema-less empty partitions the bloom route
    # legitimately produces.)
    # rid follows the id column's type (int64 doc ids, string urls, ...):
    # snapshot rows carry a null rid of the SAME type so the tag-union
    # schemas agree, and empty shuffle partitions get a typed result.
    # A pre-fingerprinted snapshot has no id column — take the type from
    # the new side instead (parquet metadata read, no execution).
    id_type = (
        new_ds if snapshot_is_fp else snap_fp
    ).schema().base_schema.field(id_col).type

    def tag(role: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "rid": (
                        batch[id_col] if role == 0
                        else pa.nulls(batch.num_rows, id_type)
                    ),
                    "fp_hi": batch["fp_hi"],
                    "fp_lo": batch["fp_lo"],
                    "role": pa.array(
                        np.full(batch.num_rows, role, dtype=np.int8)
                    ),
                }
            )

        return f

    both = new_fp.map_batches(tag(0), batch_format="pyarrow").union(
        snap_fp.map_batches(tag(1), batch_format="pyarrow")
    ).repartition(num_blocks=num_partitions, keys=["fp_hi"])

    def semi(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type)})
        hi = batch["fp_hi"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = batch["fp_lo"].combine_chunks().to_numpy(zero_copy_only=False)
        role = batch["role"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = np.empty(len(hi), dtype=[("a", "<i8"), ("b", "<i8")])
        keys["a"], keys["b"] = hi, lo
        is_snap = role == 1
        hit = np.isin(keys[~is_snap], keys[is_snap])
        # keep the rid column on the Arrow side: snapshot rows carry null
        # rid, and a to_numpy() on an int64-with-nulls column would round
        # the whole column through float64 (silently corrupting ids
        # >= 2^53). The boolean mask selects only new-row hits, whose rid
        # is never null, so the filtered column stays exactly typed.
        mask = np.zeros(batch.num_rows, dtype=bool)
        mask[~is_snap] = hit
        return pa.table(
            {id_col: batch.filter(pa.array(mask))["rid"].combine_chunks()}
        )

    dropped = both.map_batches(
        semi, batch_format="pyarrow", batch_size=None
    ).materialize()

    n_dropped = dropped.count()
    if n_dropped == 0:
        return new_ds
    if n_dropped <= broadcast_max:
        parts = [
            b[id_col].combine_chunks()
            for b in dropped.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        drop_ref = ray.put(pa.concat_arrays(parts))

        def keep_new(batch: pa.Table) -> pa.Table:
            arr = ray.get(drop_ref)
            return batch.filter(
                pc.invert(pc.is_in(batch[id_col], value_set=arr))
            )

        return new_ds.map_batches(keep_new, batch_format="pyarrow")

    return new_ds.join(
        dropped,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(id_col,),
    )
