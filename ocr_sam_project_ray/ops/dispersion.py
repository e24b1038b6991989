"""Robust per-group dispersion statistics — the outlier-resistant
profile (median / quartiles / IQR) a platform monitors per segment
before trusting a mean: one bot with million-dollar values moves an
average, not a median.

``events_value_dispersion``: per event_type over integer cents
(relational._cents contract): n, p25, p50, p75 (DuckDB quantile_disc
rank rule — shared walk ops/outliers.quantile_disc_walk) and
iqr = p75 - p25. Plan = the grouped-histogram family
(ops/grouped_quantiles): per-batch (group, cents) histogram combiners →
one two-key groupby → bounded per-group walk. Output rows = |groups| —
bounded by contract; the histogram is bounded by |groups| × distinct
cent values (2-decimal money → naturally small domain; the same
bounded-discrete-domain assumption token_count_quantiles documents).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..context import configure_data_context
from .outliers import quantile_disc_walk
from .relational import _cents

QS = (0.25, 0.5, 0.75)


def events_value_dispersion(
    sf_dir: str, num_partitions: int = 2
) -> pd.DataFrame:
    """(event_type, n, p25, p50, p75, iqr) over integer cents —
    group-count-bounded output."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = (
            pa.table(
                {
                    "event_type": batch["event_type"],
                    "cents": _cents(batch["value"]),
                }
            )
            .group_by(["event_type", "cents"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["event_type", "cents", "n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"], num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "cents"])
        .reset_index(drop=True)
    )
    rows = []
    for g, sub in hist.groupby("event_type", sort=True):
        walked = quantile_disc_walk(
            sub.cents.to_numpy(), sub.n.to_numpy(), QS
        )
        p25, p50, p75 = (walked[q] for q in QS)
        rows.append(
            {
                "event_type": g,
                "n": int(sub.n.sum()),
                "p25": p25,
                "p50": p50,
                "p75": p75,
                "iqr": p75 - p25,
            }
        )
    return pd.DataFrame(rows)


SQL_EVENTS_VALUE_DISPERSION = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(cents, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(cents, 0.5)  AS BIGINT) AS p50,
       CAST(quantile_disc(cents, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(cents, 0.75) - quantile_disc(cents, 0.25)
            AS BIGINT) AS iqr
FROM c GROUP BY event_type ORDER BY event_type
"""
