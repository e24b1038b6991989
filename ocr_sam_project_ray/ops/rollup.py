"""Hierarchical ROLLUP aggregation (SQL GROUPING SETS) — the
subtotal/grand-total report shape: one pass produces counts and sums at
(event_type, hour), (event_type), and () levels.

Plan: the FINEST level is computed distributed (per-batch Arrow
combiner → one hash groupby), exactly like events_hourly; the coarser
levels are then derived from that grid, which is bounded by CONTRACT at
|event_type| × 24 rows (categorical × hour-of-day — independent of
corpus size), so the super-aggregation runs in a single one-block
map_batches, never touching the driver. Rolled-up levels use the
sentinel 'ALL' instead of SQL NULL (the input columns are non-null, so
COALESCE in the oracle is unambiguous) — this keeps every output column
a non-null string/int and avoids the null-dtype divergence between
engines. Value arithmetic is the engine-wide integer-cents contract
(half-away-from-zero like DuckDB round(); see relational._cents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..context import configure_data_context

ALL = "ALL"
_SEED = "__rollup_seed__"


def events_rollup(sf_dir: str, num_partitions: int = 2) -> Dataset:
    """ROLLUP(event_type, hour-of-day) over events: n (row count) and
    value_cents (integer-cents sum) at three levels; rolled columns carry
    'ALL'. Output rows = |types|*24 + |types| + 1, bounded by contract."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    from .relational import _cents

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"])
        hr = pc.cast(pc.hour(batch["ts"]), pa.int64())
        t = pa.table(
            {"event_type": batch["event_type"], "hr": hr, "cents": cents}
        )
        agg = t.group_by(["event_type", "hr"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return agg.rename_columns(["event_type", "hr", "n", "value_cents"])

    from ray.data.aggregate import Sum

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"], num_partitions=num_partitions)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )

    # Empty-input boundary: Ray skips map_batches entirely on a zero-row
    # dataset, while SQL ROLLUP always emits the grand-total row. A
    # sentinel seed row (filtered back out below; n=0 contributes
    # nothing) guarantees super_levels runs exactly once even on an
    # empty events table, emitting (ALL, ALL, 0, 0) — the engine's
    # integer-cents contract has no NULL, so the empty-corpus total
    # renders as 0 where SQL SUM would be NULL (documented divergence,
    # reachable only at zero input rows).
    seed = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([_SEED], pa.string()),
                "hr": pa.array([-1], pa.int64()),
                "n": pa.array([0], pa.int64()),
                "value_cents": pa.array([0], pa.int64()),
            }
        )
    )
    finest = finest.union(seed)

    def super_levels(batch: pa.Table) -> pa.Table:
        # batch = the complete finest grid (repartition(1) upstream;
        # bounded by contract at |types| x 24 rows) + the seed row
        batch = batch.filter(pc.not_equal(batch["event_type"], _SEED))
        hr_s = pc.utf8_lpad(
            pc.cast(batch["hr"], pa.string()), width=2, padding="0"
        )
        lvl2 = pa.table(
            {
                "event_type": batch["event_type"],
                "hr": hr_s,
                "n": batch["n"],
                "value_cents": batch["value_cents"],
            }
        )
        by_type = (
            lvl2.group_by("event_type")
            .aggregate([("n", "sum"), ("value_cents", "sum")])
            .rename_columns(["event_type", "n", "value_cents"])
        )
        lvl1 = pa.table(
            {
                "event_type": by_type["event_type"],
                "hr": pa.array([ALL] * len(by_type), pa.string()),
                "n": by_type["n"],
                "value_cents": by_type["value_cents"],
            }
        )
        n_tot = pc.sum(lvl2["n"]).as_py() or 0
        c_tot = pc.sum(lvl2["value_cents"]).as_py() or 0
        lvl0 = pa.table(
            {
                "event_type": pa.array([ALL], pa.string()),
                "hr": pa.array([ALL], pa.string()),
                "n": pa.array([n_tot], pa.int64()),
                "value_cents": pa.array([c_tot], pa.int64()),
            }
        )
        return pa.concat_tables([lvl2, lvl1, lvl0])

    return finest.repartition(1).map_batches(
        super_levels, batch_format="pyarrow", batch_size=None
    )


def events_cube(sf_dir: str, num_partitions: int = 2) -> Dataset:
    """CUBE(event_type, hour-of-day): the ROLLUP levels plus the
    hour-only marginals — same distributed-finest-grid plan, one extra
    bounded super-aggregation over the other axis."""
    configure_data_context()
    base = events_rollup(sf_dir, num_partitions=num_partitions)

    def add_hr_marginals(batch: pa.Table) -> pa.Table:
        # batch = the complete ROLLUP result (repartition(1) upstream;
        # bounded by contract). The (type, hr) grid rows marginalize
        # over event_type to produce the hour-only level CUBE adds.
        finest = batch.filter(
            pc.and_(
                pc.not_equal(batch["event_type"], ALL),
                pc.not_equal(batch["hr"], ALL),
            )
        )
        by_hr = (
            finest.group_by("hr")
            .aggregate([("n", "sum"), ("value_cents", "sum")])
            .rename_columns(["hr", "n", "value_cents"])
        )
        hr_level = pa.table(
            {
                "event_type": pa.array([ALL] * len(by_hr), pa.string()),
                "hr": by_hr["hr"],
                "n": by_hr["n"],
                "value_cents": by_hr["value_cents"],
            }
        )
        return pa.concat_tables([batch.select(hr_level.column_names),
                                 hr_level])

    return base.repartition(1).map_batches(
        add_hr_marginals, batch_format="pyarrow", batch_size=None
    )


SQL_EVENTS_CUBE = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(lpad(CAST(hr AS VARCHAR), 2, '0'), 'ALL') AS hr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr, value
      FROM events)
GROUP BY CUBE(event_type, hr)
ORDER BY event_type, hr
"""


SQL_EVENTS_ROLLUP = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(lpad(CAST(hr AS VARCHAR), 2, '0'), 'ALL') AS hr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr, value
      FROM events)
GROUP BY ROLLUP(event_type, hr)
ORDER BY event_type, hr
"""
