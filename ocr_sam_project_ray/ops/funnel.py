"""Event-sequence funnel analysis — the ordered-subsequence counting a
web-analytics / training-telemetry pipeline runs over its event log:
"how many users performed view → click → purchase, in that order?".

Semantics (the exact contract the DuckDB oracle recomputes):
a user reaches step k when there exist events e_1 … e_k with
``event_type = steps[i]`` and STRICTLY increasing ``ts``
(ties on ts do NOT chain — same rule as the cascaded
``min(ts) … WHERE ts > prev`` SQL). The greedy earliest-completion scan
is optimal for this subsequence test (exchange argument: replacing any
chosen event with the earliest valid one never invalidates a later
step), so the per-user kernel is a single pass over the user's sorted
events.

Scale shape:
1. read is column-pruned to (user_id, ts, event_type) and row-filtered
   to the funnel's own types BEFORE the shuffle — only relevant rows
   move;
2. ``groupby(user_id).map_groups`` computes one tiny row per user
   (steps_reached); the documented one-key-fits-one-group assumption
   is shared with events_cumsum/user_sessions and takes the same
   opt-in hot-key guard (ops/guards.py);
3. per-user rows collapse through a partial histogram combiner →
   one bounded groupby; the result is len(steps) rows.

The reference has no event-funnel surface (single-document Lambda
handlers, src/ocr_processor/app.py); this operator is part of the
engine's beyond-reference analytics surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .segmented import filter_overflow_segments, sorted_segments

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(
    sf_dir: str,
    steps: Sequence[str] = FUNNEL_STEPS,
    num_partitions: int = 4,
    max_group_rows: Optional[int] = None,
    cap_stats=None,
) -> Dataset:
    """Per-step user counts for the ordered funnel ``steps``. Returns a
    Dataset of len(steps) rows: (step 1-based BIGINT, event_type,
    n_users = users whose event log contains the first ``step`` funnel
    types as a strictly-ts-increasing subsequence)."""
    configure_data_context()
    steps = list(steps)
    step_of = {t: i for i, t in enumerate(steps)}

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    types = pa.array(steps, pa.string())

    def keep_funnel_types(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["event_type"], value_set=types))

    n_steps_total = len(steps)

    def reached(batch: pa.Table) -> pa.Table:
        """Arrow-native segmented kernel (round 4): cascaded min-ts per
        step over ALL users of the partition at once — t_k = per-user
        min{ts : type == step_k, ts > t_(k-1)} (the exact recurrence the
        SQL oracle unrolls; on sorted events the greedy earliest-
        completion pass picks the same minima)."""
        empty = pa.table({"steps_reached": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch, [("user_id", "ascending"), ("ts", "ascending")]
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        if s.num_rows == 0:
            return empty
        ts = pc.cast(s["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        codes = pc.index_in(
            s["event_type"], value_set=types
        ).to_numpy(zero_copy_only=False)
        seg_id = np.repeat(np.arange(len(starts)), counts)
        sent = np.iinfo(np.int64).max
        prev = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
        reached_k = np.zeros(len(starts), dtype=np.int64)
        for k in range(n_steps_total):
            mask = (codes == k) & (ts > prev[seg_id])
            tm = np.where(mask, ts, sent)
            tk = np.minimum.reduceat(tm, starts)
            ok = tk != sent
            reached_k += ok
            # a broken step poisons all later ones (ts > sent never holds)
            prev = np.where(ok, tk, sent)
        return pa.table({"steps_reached": pa.array(reached_k, pa.int64())})

    per_user = (
        ds.map_batches(keep_funnel_types, batch_format="pyarrow")
        .repartition(num_blocks=num_partitions, keys=["user_id"])
        .map_batches(reached, batch_format="pyarrow", batch_size=None)
    )

    n_steps = len(steps)

    def hist_partial(batch: pa.Table) -> pa.Table:
        r = batch["steps_reached"].to_numpy(zero_copy_only=False)
        # n_users at step k = users with steps_reached >= k
        counts = np.bincount(r, minlength=n_steps + 1)[1:]
        cum = counts[::-1].cumsum()[::-1]
        return pa.table(
            {
                "step": pa.array(np.arange(1, n_steps + 1), pa.int64()),
                "n_users": pa.array(cum.astype("int64"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        per_user.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("step", num_partitions=1)
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    # the aggregate is bounded by contract at len(steps) rows; collecting
    # it lets the op emit a zero-count row for EVERY step even when no
    # funnel-type events exist at all (the SQL contract always returns
    # one row per step)
    counts = {int(r["step"]): int(r["n_users"]) for r in agg.take_all()}
    return ray.data.from_arrow(
        pa.table(
            {
                "step": pa.array(range(1, n_steps + 1), pa.int64()),
                "event_type": pa.array(steps, pa.string()),
                "n_users": pa.array(
                    [counts.get(k, 0) for k in range(1, n_steps + 1)],
                    pa.int64(),
                ),
            }
        )
    )


def sql_events_funnel(steps: Sequence[str] = FUNNEL_STEPS) -> str:
    """Cascaded earliest-completion recompute: s_k = per-user min ts of a
    step-k event strictly after the user's s_{k-1}."""
    steps = list(steps)
    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for k in range(2, len(steps) + 1):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{k - 1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{steps[k - 1]}' AND e.ts > p.t "
            f"GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS step, '{steps[k - 1]}' AS event_type, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{k}"
        for k in range(1, len(steps) + 1)
    ]
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT * FROM (" + " UNION ALL ".join(selects)
        + ") ORDER BY step"
    )
