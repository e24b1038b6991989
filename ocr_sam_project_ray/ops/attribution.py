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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .guards import group_overflows

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

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "attributed_event_id": pd.Series([], dtype="int64"),
        }
    )

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        if group_overflows(g, max_group_rows, cap_stats):
            return empty.copy()
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        is_conv = (g["event_type"] == CONVERSION).to_numpy()
        if not is_conv.any():
            return empty.copy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        eid = g["event_id"].to_numpy()
        t_ts, t_eid = ts[~is_conv], eid[~is_conv]
        p_ts, p_eid = ts[is_conv], eid[is_conv]
        # greatest (ts, event_id) touch with t.ts <= p.ts: among equal-ts
        # touches the (ts, event_id)-sorted order puts the max event_id
        # last, so "rightmost touch with ts <= p_ts" IS the answer
        if len(t_ts) == 0:  # conversions but no touches at all
            attributed = np.full(len(p_eid), -1, dtype="int64")
        else:
            idx = np.searchsorted(t_ts, p_ts, side="right") - 1
            attributed = np.where(idx >= 0, t_eid[np.maximum(idx, 0)], -1)
        out = pd.DataFrame(
            {
                "event_id": p_eid,
                "user_id": g["user_id"].to_numpy()[is_conv],
                "attributed_event_id": attributed.astype("int64"),
            }
        )
        return out

    return (
        ds.map_batches(keep_types, batch_format="pyarrow")
        .groupby("user_id", num_partitions=num_partitions)
        .map_groups(attribute, batch_format="pandas")
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
