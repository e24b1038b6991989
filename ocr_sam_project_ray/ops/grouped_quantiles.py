"""Per-group EXACT quantiles — the per-language / per-source
distribution audit every corpus report contains (e.g. CCNet's per-lang
length statistics): token-count p50/p90/p99 for every group value,
computed exactly at any scale.

Same machinery as ops/corpus_stats.token_count_quantiles, lifted to
groups: per-batch (group, n_tokens -> count) Arrow combiners collapse
the corpus to a histogram BEFORE the shuffle, one small two-key groupby
sums the partials, and the quantile walk runs over each group's
(bounded) distinct-value histogram. quantile_disc semantics: element at
0-based rank floor((n-1)*q) of the group's sorted multiset — matching
DuckDB's ``quantile_disc`` exactly, so the oracle is one GROUP BY.

Scale notes: the shuffled relation is (distinct groups x distinct
values) rows — histogram-sized, independent of corpus row count. The
walk is per-group sequential over that bounded histogram; with a
pathological high-cardinality group column you would bucket the walk
per group inside map_batches instead (the hostquota cell pattern), but
group columns in corpus reports (lang, source, tier) are low-cardinality
by construction.

The reference has no corpus statistics; beyond-reference op.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..context import configure_data_context
from .textstats import flat_tokens

DEFAULT_QS = (0.5, 0.9, 0.99)


def grouped_token_quantiles(
    ds: Dataset, group_col: str = "lang", qs=DEFAULT_QS,
    text_col: str = "text", num_partitions: int = 2,
) -> pd.DataFrame:
    """One row per group value: (group_col, n_docs, p50, p90, ...) —
    group-count-bounded output, so the driver return is scale-safe."""
    configure_data_context()

    def partial(batch: pa.Table) -> pa.Table:
        counts = pa.array(flat_tokens(batch[text_col])[0], pa.int64())
        agg = (
            pa.table({group_col: batch[group_col], "n_tokens": counts})
            .group_by([group_col, "n_tokens"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns([group_col, "n_tokens", "n_docs"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "n_tokens"], num_partitions=num_partitions)
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
        .sort_values([group_col, "n_tokens"])
        .reset_index(drop=True)
    )
    rows = []
    for g, sub in hist.groupby(group_col, sort=True):
        total = int(sub.n_docs.sum())
        row = {group_col: g, "n_docs": total}
        vals = sub.n_tokens.tolist()
        cnts = sub.n_docs.tolist()
        for q in qs:
            # DuckDB quantile_disc rank (0-based) = ceil(q*n) - 1,
            # verified empirically across n and q in test_grouped_quantiles
            target = max(0, math.ceil(q * total) - 1)
            cum = 0
            val = int(vals[-1]) if vals else 0
            for v, c in zip(vals, cnts):
                cum += int(c)
                if cum > target:
                    val = int(v)
                    break
            row[f"p{int(q * 100)}"] = val
        rows.append(row)
    return pd.DataFrame(rows)


def sql_grouped_token_quantiles(
    table: str = "documents", group_col: str = "lang", qs=DEFAULT_QS,
    text_col: str = "text",
) -> str:
    from .textstats import sql_n_tokens

    n_tokens = sql_n_tokens(text_col)
    q_cols = ",\n               ".join(
        f"CAST(quantile_disc(n, {q}) AS BIGINT) AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
        SELECT {group_col},
               CAST(count(*) AS BIGINT) AS n_docs,
               {q_cols}
        FROM (SELECT {group_col}, {n_tokens} AS n FROM {table})
        GROUP BY {group_col} ORDER BY {group_col}
    """
