"""Exact stratified sampling — keep EXACTLY ceil(fraction × group size)
documents per stratum (language, source, quality tile), chosen in a
deterministic content-hash order. The corpus-balancing step that
hash-threshold sampling (textstats.sample_by_content_hash) cannot do:
a hash cut keeps a BINOMIAL share of each group; this op keeps the exact
quota, reproducibly.

Contract (all integer; what the DuckDB oracle recomputes):
- order within a stratum = (md5(text), id);
- fraction = num/den (integers — no float threshold anywhere);
- keep the rows with within-stratum 1-based rank rn satisfying
  (rn - 1) * den < group_total * num  ⟺  rn <= ceil(total * num / den);
- output (id, stratum, stratum_rank = rn).

Scale shape — the mixture_sample prefix-sum pattern with ROW counts:
1. one keyed pass emits (stratum, bucket = first md5 byte) per row;
2. one SMALL groupby counts rows per (stratum, bucket); the driver folds
   them into per-bucket exclusive rank offsets and per-stratum totals
   (bounded state: n_strata × 256 rows, broadcast once);
3. groupby((stratum, bucket)).map_groups sorts each bucket by (hash, id)
   and keeps rows whose offset + local position clears the quota test.
Partitioning assumption (documented, as for mixture/pack): one
(stratum, bucket) cell fits one group — 1/256 of one stratum; widen the
bucket to two hash bytes for larger corpora.

The reference has no sampling stage at all (SURVEY §2.6); part of the
engine's beyond-reference training-data surface.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import configure_data_context


def stratified_sample(
    ds: Dataset,
    num: int,
    den: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 4,
) -> Dataset:
    """Keep exactly ceil(group_size × num/den) rows per stratum in
    deterministic (md5(text), id) order → Dataset(id_col, stratum,
    stratum_rank)."""
    if not (0 <= num and den > 0):
        raise ValueError("fraction must be num/den with num >= 0, den > 0")
    configure_data_context()

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
              for t in texts]
        return pa.table(
            {
                id_col: batch[id_col],
                "stratum": batch[strata_col],
                "h": pa.array(hs, pa.string()),
                "bucket": pa.array([int(h[:2], 16) for h in hs], pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Count

    counts = (
        keyed_ds.groupby(["stratum", "bucket"], num_partitions=2)
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # bounded: n_strata x 256 rows
        .sort_values(["stratum", "bucket"])
    )
    offsets: dict[tuple, int] = {}
    totals: dict = {}
    for _, row in counts.iterrows():
        s = row.stratum
        offsets[(s, int(row.bucket))] = totals.get(s, 0)
        totals[s] = totals.get(s, 0) + int(row.cnt)
    state_ref = ray.put((offsets, totals))

    from .segmented import sorted_segments_multi

    def select_local(batch: pa.Table) -> pa.Table:
        """Arrow-native segmented kernel (round 4): every (stratum,
        bucket) cell of the partition in one pass — within-stratum ranks
        from segment-local aranges plus the broadcast cell offsets."""
        id_type = batch.schema.field(id_col).type
        empty = pa.table(
            {id_col: pa.array([], id_type),
             "stratum": pa.array([], pa.string()),
             "stratum_rank": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        offs, tots = ray.get(state_ref)
        s, starts, counts = sorted_segments_multi(
            batch, ["stratum", "bucket"],
            [("h", "ascending"), (id_col, "ascending")],
        )
        n = s.num_rows
        str_at = s["stratum"].take(pa.array(starts, pa.int64())).to_pylist()
        bkt_at = s["bucket"].take(pa.array(starts, pa.int64())).to_pylist()
        off_seg = np.fromiter(
            (offs[(sv, int(bv))] for sv, bv in zip(str_at, bkt_at)),
            dtype=np.int64, count=len(starts),
        )
        lim_seg = np.fromiter(
            (tots[sv] * num for sv in str_at),
            dtype=np.int64, count=len(starts),
        )
        seg_start = np.repeat(starts, counts)
        rn = (np.arange(n, dtype=np.int64) - seg_start + 1
              + np.repeat(off_seg, counts))
        keep = (rn - 1) * den < np.repeat(lim_seg, counts)
        kept = s.filter(pa.array(keep))
        return pa.table(
            {
                id_col: kept[id_col],
                "stratum": kept["stratum"],
                "stratum_rank": pa.array(rn[keep], pa.int64()),
            }
        )

    return keyed_ds.repartition(
        num_blocks=num_partitions, keys=["stratum", "bucket"]
    ).map_batches(select_local, batch_format="pyarrow", batch_size=None)


def sql_stratified_sample(
    num: int, den: int, table: str = "documents",
    strata_col: str = "lang", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB recompute — window row_number + count per stratum, same
    integer quota test."""
    return f"""
        WITH t AS (
          SELECT {id_col}, {strata_col} AS stratum,
                 md5(coalesce({text_col}, '')) AS h
          FROM {table}
        ),
        r AS (
          SELECT {id_col}, stratum,
                 row_number() OVER (
                   PARTITION BY stratum ORDER BY h, {id_col}) AS rn,
                 count(*) OVER (PARTITION BY stratum) AS total
          FROM t
        )
        SELECT {id_col}, stratum, CAST(rn AS BIGINT) AS stratum_rank
        FROM r WHERE (rn - 1) * {den} < total * {num}
    """
