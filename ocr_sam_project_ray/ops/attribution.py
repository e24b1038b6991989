"""Last-touch attribution — for every conversion event, find the most
recent preceding touch event by the same user (the canonical marketing/
telemetry attribution query; also the self-join flavor of the as-of
family: ops/relational.events_asof_orders joins TWO tables, this
attributes WITHIN one ordered log).

Semantics (what the DuckDB oracle recomputes): for each 'purchase'
event p, attributed = the touch event ('click' or 'view') t of the same
user with the greatest (ts, event_id) such that t.ts <= p.ts and t is
not p; -1 sentinel when the user has no touch before the purchase
(sentinel instead of NULL — the engine's null-int dtype convention).
Same-timestamp touches DO attribute (<=), broken by event_id DESC —
both rules pinned by the hand-case test.

Scale shape: column-pruned read filtered to the participating types
BEFORE the one user-key shuffle; per-user kernel is a vectorized
merge — np.searchsorted of purchase positions into the sorted touch
positions (no per-event Python loop). One-key-per-group assumption +
hot-key guard shared with the rest of the grouped-ordered family.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .segmented import filter_overflow_segments, sorted_segments

CONVERSION = "purchase"
TOUCHES = ("click", "view")


def purchase_attribution(
    sf_dir: str,
    num_partitions: int = 4,
    max_group_rows: Optional[int] = None,
    cap_stats=None,
) -> Dataset:
    """One row per conversion: (event_id, user_id, attributed_event_id).
    attributed_event_id = -1 when no touch precedes the conversion."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    types = pa.array((CONVERSION,) + TOUCHES, pa.string())

    def keep_types(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["event_type"], value_set=types))

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "attributed_event_id": pa.array([], pa.int64()),
        }
    )

    def attribute(batch: pa.Table) -> pa.Table:
        """Arrow-native segmented kernel (round 4): one searchsorted over
        ALL users of the partition. Composite key (segment, ts-rank)
        keeps the per-user "rightmost touch with ts <= conversion ts"
        semantics — among equal-ts touches the (ts, event_id) sort puts
        the max event_id last, matching the oracle's ORDER BY ts DESC,
        event_id DESC LIMIT 1."""
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch,
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")],
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        if s.num_rows == 0:
            return empty
        is_conv = pc.equal(s["event_type"], CONVERSION).to_numpy(
            zero_copy_only=False
        )
        if not is_conv.any():
            return empty
        ts = pc.cast(s["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = s["event_id"].to_numpy(zero_copy_only=False)
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        # dense ts ranks keep the composite in int64 (seg * (n+1) + rank;
        # both factors < n, so the product stays far below 2^63)
        _, rank = np.unique(ts, return_inverse=True)
        comp = seg_id * (len(ts) + 1) + rank
        t_mask = ~is_conv
        t_comp, t_eid, t_seg = comp[t_mask], eid[t_mask], seg_id[t_mask]
        p_comp, p_eid, p_seg = comp[is_conv], eid[is_conv], seg_id[is_conv]
        if len(t_comp) == 0:
            attributed = np.full(len(p_eid), -1, dtype=np.int64)
        else:
            idx = np.searchsorted(t_comp, p_comp, side="right") - 1
            safe = np.maximum(idx, 0)
            valid = (idx >= 0) & (t_seg[safe] == p_seg)
            attributed = np.where(valid, t_eid[safe], -1)
        return pa.table(
            {
                "event_id": pa.array(p_eid, pa.int64()),
                "user_id": s["user_id"].filter(pa.array(is_conv)),
                "attributed_event_id": pa.array(
                    attributed.astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(keep_types, batch_format="pyarrow")
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(attribute, batch_format="pyarrow", batch_size=None)
    )


SQL_PURCHASE_ATTRIBUTION = f"""
SELECT p.event_id, p.user_id,
       CAST(coalesce((
         SELECT t.event_id FROM events t
         WHERE t.user_id = p.user_id
           AND t.event_type IN ('{TOUCHES[0]}', '{TOUCHES[1]}')
           AND t.ts <= p.ts
         ORDER BY t.ts DESC, t.event_id DESC LIMIT 1
       ), -1) AS BIGINT) AS attributed_event_id
FROM events p
WHERE p.event_type = '{CONVERSION}'
ORDER BY p.event_id
"""
