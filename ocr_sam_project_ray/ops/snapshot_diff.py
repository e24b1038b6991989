"""Crawl snapshot diff — classify every document id across two corpus
snapshots as added / removed / changed / unchanged (the monthly-crawl
bookkeeping op: ops/incremental.py DROPS re-crawls; this one REPORTS the
delta — what a crawl-ops dashboard and a retraining-trigger both read).

Scale shape (both sides corpus-sized, the incremental.py discipline):
1. each side reduces to payload-free fingerprint rows inside
   ``map_batches``: (id, side, fp_hi, fp_lo) — 128-bit content md5 split
   into two int64s (birthday-safe at 10^12 docs);
2. tag-union the two row sets and hash-repartition ONCE on the id key —
   the engine's co-partition convention (no ``Dataset.join``; the Ray
   2.49 empty-block schema trap, cf. ops/graph.py docstring);
3. partition-local vectorized classify (numpy lexsort + run-length over
   the sorted id column; every id has <= 2 rows, both in the same
   partition by construction).
Output Dataset(doc_id, status:string, in_old:bool, in_new:bool) —
``changed`` means present on both sides with differing content
fingerprints ("content equality" = md5 equality, the same proxy the
certified dedup_incremental contract uses).

Oracle: plain ANSI FULL-OUTER-JOIN CASE classification over the same
two (decorated) snapshot selections — see the ``snapshot_diff`` driver
query.

Behavioral lineage: the reference reprocesses whole batches and tracks
per-document status rows in DynamoDB (src/shared/database.py) but has no
cross-batch delta surface; beyond-reference crawl-ops op.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..context import configure_data_context

STATUSES = ("added", "removed", "changed", "unchanged")


def _fp_rows(batch: pa.Table, id_col: str, text_col: str,
             side: int) -> pa.Table:
    ids = batch[id_col]
    his, los = [], []
    for t in batch[text_col].to_pylist():
        d = hashlib.md5((t or "").encode("utf-8")).digest()
        his.append(int.from_bytes(d[:8], "big", signed=True))
        los.append(int.from_bytes(d[8:], "big", signed=True))
    return pa.table(
        {
            "doc_id": ids,
            "side": pa.array([side] * batch.num_rows, pa.int8()),
            "fp_hi": pa.array(his, pa.int64()),
            "fp_lo": pa.array(los, pa.int64()),
        }
    )


def snapshot_diff(
    old: Dataset, new: Dataset, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
) -> Dataset:
    """Dataset(doc_id, status, in_old, in_new) — see module docstring."""
    configure_data_context()

    old_fp = old.map_batches(
        lambda b: _fp_rows(b, id_col, text_col, 0), batch_format="pyarrow"
    )
    new_fp = new.map_batches(
        lambda b: _fp_rows(b, id_col, text_col, 1), batch_format="pyarrow"
    )
    unioned = old_fp.union(new_fp).repartition(
        num_blocks=num_partitions, keys=["doc_id"]
    )

    def classify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                    "in_old": pa.array([], pa.bool_()),
                    "in_new": pa.array([], pa.bool_()),
                }
            )
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        side = np.asarray(batch["side"].to_pylist(), dtype=np.int8)
        hi = np.asarray(batch["fp_hi"].to_pylist(), dtype=np.int64)
        lo = np.asarray(batch["fp_lo"].to_pylist(), dtype=np.int64)
        order = np.lexsort((side, ids))
        ids, side, hi, lo = ids[order], side[order], hi[order], lo[order]
        uniq, starts, counts = np.unique(ids, return_index=True,
                                         return_counts=True)
        status = np.empty(len(uniq), dtype=object)
        in_old = np.zeros(len(uniq), dtype=bool)
        in_new = np.zeros(len(uniq), dtype=bool)
        singles = counts == 1
        s_idx = starts[singles]
        s_new = side[s_idx] == 1
        status[singles] = np.where(s_new, "added", "removed")
        in_old[singles] = ~s_new
        in_new[singles] = s_new
        both = counts == 2
        b_idx = starts[both]                 # old row (side 0 sorts first)
        same = (hi[b_idx] == hi[b_idx + 1]) & (lo[b_idx] == lo[b_idx + 1])
        status[both] = np.where(same, "unchanged", "changed")
        in_old[both] = True
        in_new[both] = True
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "status": pa.array(status.tolist(), pa.string()),
                "in_old": pa.array(in_old, pa.bool_()),
                "in_new": pa.array(in_new, pa.bool_()),
            }
        )

    # batch_size=None: one batch per co-partitioned block, so both of an
    # id's rows are in the same classify call (group completeness)
    return unioned.map_batches(classify, batch_format="pyarrow",
                               batch_size=None)


def sql_snapshot_diff(old_sql: str, new_sql: str,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """DuckDB recompute: FULL OUTER JOIN of the two snapshot SELECTs
    (each must yield (id_col, text_col))."""
    return f"""
        WITH o AS ({old_sql}), n AS ({new_sql})
        SELECT coalesce(o.{id_col}, n.{id_col}) AS doc_id,
               CASE
                 WHEN o.{id_col} IS NULL THEN 'added'
                 WHEN n.{id_col} IS NULL THEN 'removed'
                 WHEN md5(coalesce(o.{text_col}, ''))
                      = md5(coalesce(n.{text_col}, '')) THEN 'unchanged'
                 ELSE 'changed'
               END AS status,
               o.{id_col} IS NOT NULL AS in_old,
               n.{id_col} IS NOT NULL AS in_new
        FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
    """
