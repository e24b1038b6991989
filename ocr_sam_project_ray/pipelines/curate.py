"""End-to-end training-corpus curation — the flagship composition of the
LLM-data ops into ONE streaming pass:

    read → Gopher/C4 quality filter → exact content dedup →
    MinHash/LSH near-dup cluster dedup → benchmark decontamination →
    partitioned parquet

Every stage is an existing certified operator (ops/quality, ops/dedup_text,
ops/graph, ops/contamination); this module only composes them and adds
PER-STAGE ROW ACCOUNTING without breaking streaming: a zero-CPU counter
actor receives one fire-and-forget ``add`` per batch from pass-through tap
stages, so survivor counts per stage come out of the SAME single execution
that wrote the output — no stage is ever re-executed just to count it
(counting by ``ds.count()`` per stage would re-run the whole prefix once
per stage; at 100 TB that is 4× the job).

Reading the counts: actor messages are asynchronous, so after the sink
finishes the tail of the per-batch ``add`` calls may still be in flight;
``_settled_counts`` polls until two consecutive reads agree (bounded).

Scale shape: quality filter + decontamination are shuffle-free map_batches;
the two dedups are the certified hash-shuffle / LSH chains with their
hot-key guards; the only driver-side state is the stage-count dict.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import pyarrow as pa
import ray
from ray.data import Dataset

from ..context import configure_data_context
from ..ops.contamination import drop_contaminated
from ..ops.dedup_text import LshDropStats, dedup_exact, dedup_near_minhash
from ..ops.quality import filter_quality


@ray.remote(num_cpus=0)
class StageCounts:
    """Zero-CPU per-stage row counter (fire-and-forget adds)."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def add(self, stage: str, n: int) -> None:
        self.counts[stage] = self.counts.get(stage, 0) + n

    def get(self) -> dict[str, int]:
        return dict(self.counts)


def _tap(ds: Dataset, stage: str, counter) -> Dataset:
    """Pass-through stage that counts rows flowing past it (zero-copy)."""

    def tap(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            counter.add.remote(stage, batch.num_rows)
        return batch

    return ds.map_batches(tap, batch_format="pyarrow")


def _settled_counts(counter, attempts: int = 60, pause_s: float = 0.05) -> dict:
    prev = None
    for _ in range(attempts):
        cur = ray.get(counter.get.remote())
        if cur == prev:
            return cur
        prev = cur
        time.sleep(pause_s)
    return prev or {}


def curate_corpus(
    ds: Dataset,
    out_dir: Optional[str],
    *,
    bench_texts: Optional[Sequence[str]] = None,
    near_threshold: float = 0.7,
    num_partitions: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_dedup: bool = False,
    repair_encoding: bool = False,
    assign_split: bool = False,
) -> dict:
    """Run the full curation chain; write partitioned parquet to ``out_dir``
    (or leave unwritten if None) and return per-stage metrics:
    rows_in / after_quality / after_exact_dedup / after_near_dedup /
    [after_line_dedup] / after_decontam / rows_out plus the LSH hot-bucket
    skip counters. ``line_dedup=True`` adds the C4 corpus-global line strip
    after near-dedup (rewrites ``text_col``; docs left with zero lines are
    dropped, C4-style). ``repair_encoding=True`` prepends the mojibake
    chain repair (ops/mojibake — suspect-gated, so clean corpora pay one
    vectorized scan); ``assign_split=True`` appends deterministic
    train/val/test columns (ops/split) and, when writing, partitions the
    parquet output by split (train/val/test directories — the layout a
    training job consumes directly)."""
    configure_data_context()
    counter = StageCounts.remote()
    lsh_stats = LshDropStats.remote()

    cur = _tap(ds, "rows_in", counter)
    if repair_encoding:
        from ..ops.mojibake import repair_chain_array

        def repair(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index(text_col), text_col,
                repair_chain_array(batch[text_col]),
            )

        # in-place rewrite: no rows added/dropped, so no tap stage
        cur = cur.map_batches(repair, batch_format="pyarrow")
    cur = _tap(filter_quality(cur, text_col=text_col), "after_quality", counter)
    cur = _tap(
        dedup_exact(cur, id_col=id_col, text_col=text_col,
                    num_partitions=num_partitions),
        "after_exact_dedup", counter,
    )
    # content_fp is dedup_exact's internal key — drop it here so it never
    # rides through the near-dup chain or into the written corpus
    cur = cur.drop_columns(["content_fp"])
    # the near-dup chain consumes its input TWICE (LSH pair generation +
    # the loser anti-join). Checkpoint once into object-store blocks
    # (spillable) so (a) quality+dedup aren't recomputed for the second
    # pass and (b) the tap counters above see each row exactly once.
    cur = cur.materialize()
    cur = _tap(
        dedup_near_minhash(cur, threshold=near_threshold, id_col=id_col,
                           text_col=text_col, num_partitions=num_partitions,
                           drop_stats=lsh_stats),
        "after_near_dedup", counter,
    )
    if line_dedup:
        from ..ops.line_dedup import line_dedup as _line_dedup
        import pyarrow.compute as pc

        # line_dedup consumes its input twice (winner resolve + apply);
        # checkpoint the near-dedup survivors once so the prefix is not
        # recomputed and the tap above still sees each row exactly once
        cur = cur.materialize()
        ld = _line_dedup(cur, id_col=id_col, text_col=text_col,
                         num_partitions=num_partitions)

        def strip(batch: pa.Table) -> pa.Table:
            kept = batch.filter(pc.greater(batch["n_lines_kept"], 0))
            return pa.table({id_col: kept[id_col],
                             text_col: kept["text_deduped"]})

        cur = _tap(ld.map_batches(strip, batch_format="pyarrow"),
                   "after_line_dedup", counter)

    if bench_texts is not None:
        cur = _tap(
            drop_contaminated(cur, list(bench_texts), text_col=text_col),
            "after_decontam", counter,
        )

    if assign_split:
        from ..ops.split import DEFAULT_SALT, _bucket, split_of

        def add_split(batch: pa.Table) -> pa.Table:
            buckets = [_bucket(f"{DEFAULT_SALT}:{i}")
                       for i in batch[id_col].to_pylist()]
            return batch.append_column(
                "bucket", pa.array(buckets, pa.int64())
            ).append_column(
                "split",
                pa.array([split_of(b) for b in buckets], pa.string()),
            )

        cur = cur.map_batches(add_split, batch_format="pyarrow")

    if out_dir is not None:
        if assign_split:
            cur.write_parquet(out_dir, partition_cols=["split"])
        else:
            cur.write_parquet(out_dir)
    else:
        cur.materialize()

    counts = _settled_counts(counter)
    counts.setdefault("rows_in", 0)
    counts["rows_out"] = counts.get(
        "after_decontam",
        counts.get("after_line_dedup", counts.get("after_near_dedup", 0)),
    )
    counts["lsh_skews"] = ray.get(lsh_stats.get.remote())
    return counts
