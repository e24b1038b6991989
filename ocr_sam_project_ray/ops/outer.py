"""FULL OUTER join of two keyed aggregates — the reconciliation-report
shape (metrics from system A vs system B per key, keeping keys present
on either side). Completes the engine's join family
(broadcast / hash / semi / anti / as-of / range — ops/relational.py).

Scope contract: each input side carries UNIQUE keys (it is an
aggregate / dimension table — the overwhelmingly common case for outer
reconciliation; a multi-match full outer is a per-key cross product and
intentionally out of scope, documented not silent).

Plan (the engine's co-partition convention — no ``Dataset.join``; the
Ray 2.49 empty-block schema trap, cf. ops/graph.py docstring):
1. pad each side to the superset schema (key, left_val, right_val) with
   NULL for the absent side — schema-aligned union is then trivial;
2. tag-union + ONE hash repartition on the key;
3. partition-local ``pa.Table.group_by(key)`` with null-skipping max:
   a key with rows from both sides folds into one output row; one-sided
   keys keep NULL on the other column, filled with 0 (COALESCE — the
   integer-report convention, avoids null-dtype divergence).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import configure_data_context


def full_outer_agg_join(
    left: Dataset,
    right: Dataset,
    key: str,
    left_val: str,
    right_val: str,
    num_partitions: int = 4,
) -> Dataset:
    """Dataset(key, left_val, right_val) over the union of both key sets;
    missing side → 0. Each side must be (key, val) with unique keys."""
    configure_data_context()

    def pad_left(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: b[key],
                left_val: b[left_val],
                right_val: pa.nulls(b.num_rows, pa.int64()),
            }
        )

    def pad_right(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: b[key],
                left_val: pa.nulls(b.num_rows, pa.int64()),
                right_val: b[right_val],
            }
        )

    unioned = (
        left.map_batches(pad_left, batch_format="pyarrow")
        .union(right.map_batches(pad_right, batch_format="pyarrow"))
        .repartition(num_blocks=num_partitions, keys=[key])
    )

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # preserve the key's actual dtype (string keys etc.) so empty
            # co-partition blocks don't carry a conflicting schema
            return pa.table(
                {
                    key: pa.array([], batch.schema.field(key).type),
                    left_val: pa.array([], pa.int64()),
                    right_val: pa.array([], pa.int64()),
                }
            )
        agg = batch.group_by(key).aggregate(
            [(left_val, "max"), (right_val, "max")]  # null-skipping
        )
        agg = agg.rename_columns([key, left_val, right_val])
        return pa.table(
            {
                key: agg[key],
                left_val: pc.fill_null(agg[left_val], 0),
                right_val: pc.fill_null(agg[right_val], 0),
            }
        )

    # batch_size=None: one batch per co-partitioned block, so both of a
    # key's rows land in the same merge call (group completeness)
    return unioned.map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def clicks_vs_purchases(sf_dir: str, num_partitions: int = 4) -> Dataset:
    """Driver-query instantiation: per-user click counts (even users
    only) FULL OUTER per-user purchase counts (users ≡ 0 mod 3) — the
    asymmetric side filters guarantee genuinely one-sided keys so the
    outer semantics are actually exercised at every corpus tier."""
    import ray.data

    from ray.data.aggregate import Sum

    configure_data_context()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def side(event_type: str, mod: int, name: str):
        def partial(b: pa.Table) -> pa.Table:
            uid = b["user_id"]
            # x % m for non-negative x via truncating integer division
            # (pyarrow has no mod kernel)
            rem = pc.subtract(
                uid, pc.multiply(pc.divide(uid, mod), mod)
            )
            keep = pc.and_(
                pc.equal(b["event_type"], event_type), pc.equal(rem, 0)
            )
            t = b.filter(keep)
            agg = t.group_by("user_id").aggregate([([], "count_all")])
            return agg.rename_columns(["user_id", name])

        return (
            ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id", num_partitions=num_partitions)
            .aggregate(Sum(name, alias_name=name))
        )

    return full_outer_agg_join(
        side("click", 2, "n_clicks"),
        side("purchase", 3, "n_purchases"),
        key="user_id",
        left_val="n_clicks",
        right_val="n_purchases",
        num_partitions=num_partitions,
    )


SQL_CLICKS_VS_PURCHASES = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click' AND user_id % 2 = 0
  GROUP BY user_id
),
p AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0
  GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
ORDER BY user_id
"""
