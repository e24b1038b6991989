"""Corpus-global line-level deduplication — the C4 cleanup step (Raffel
et al. 2020, §2.2): every distinct text line is kept at exactly ONE place
in the whole corpus (its first occurrence in (doc_id, line_idx) order) and
removed everywhere else, which strips the boilerplate sentences that
repeat across thousands of extracted web pages ("Remitase copia
autenticada…" appears 400+ times in the synthetic legal corpus — exactly
the menu/footer/disclaimer shape C4 targets on Common Crawl).

Semantics (the contract the DuckDB oracle recomputes):
- lines = text.split("\\n") on coalesce(text, ''), so '' is ONE empty line
  and empty lines dedup globally like any other line;
- winner of a line = lexicographic min (doc_id, line_idx) over every
  occurrence corpus-wide — including later repeats INSIDE the winner doc;
- output per doc: surviving lines re-joined with "\\n" in original order
  ('' when nothing survives — the contract is NULL-free so driver value-hashing never sees None-vs-NaN skew; n_lines_kept disambiguates '' from a kept empty line), plus integer kept/dropped counters.

Scale shape — two plans behind one auto switch (the repo's bounded-fast-
path pattern, cf. stages/dedup.py winner pre-pass and ops/graph.py):

1. Winner resolve (always distributed): a per-batch dict combiner emits at
   most one (line, min_id, min_idx, n_occ) row per DISTINCT line per batch
   — repeated boilerplate collapses before the shuffle — then one hash
   repartition on the line key and a vectorized per-partition keep-first
   (sort + boundary mask) with a ``pa.Table.group_by`` count sum. Only
   lines with n_occ > 1 travel further: a singleton line's winner is its
   only holder, so the dup-winner set is bounded by the corpus's
   *boilerplate* volume, not its size.
2. Apply:
   - broadcast plan (dup-winner rows <= ``broadcast_max_lines``): the
     dup-winner dict is ``ray.put`` once and every batch filters locally —
     zero payload shuffle, the default at any realistic boilerplate size;
   - distributed plan (above the bound): explode docs to occurrence rows,
     tag-union with the dup-winner table, ONE keyed repartition on line
     (partition-local winner lookup — no Dataset.join, sidestepping the
     Ray 2.49 empty-block schema trap, cf. ops/graph.py), then a keyed
     repartition on doc id and a per-partition reassembly. Both plans are
     equality-tested against each other and against the SQL oracle.

Behavioral lineage: the reference has no corpus-level pass at all (one
document per Lambda, src/ocr_processor/app.py:94-138); this op is part of
the engine's beyond-reference training-data surface, composed after the
extraction pipeline exactly where C4 sits after WET extraction.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context

# Above this many duplicated distinct lines, stop broadcasting the winner
# dict and switch to the fully distributed apply plan. 5M short lines ≈
# a few hundred MB in the object store — the same bound family as
# stages/dedup.DRIVER_WINNERS_MAX_ROWS.
BROADCAST_MAX_LINES = 5_000_000


def _occurrence_combiner(id_col: str, text_col: str):
    """Per-batch combiner: one row per distinct line in the batch with its
    in-batch winner (min (id, idx) — docs sorted ascending by id, lines
    ascending by idx, so the first traversal hit IS the min) and the
    in-batch occurrence count.

    Fully vectorized (round-4; replaces the per-line dict loop): one
    Arrow split + flatten, positions by numpy offset arithmetic, winner
    + count via one Arrow group_by (min traversal index, count_all)."""

    def combine(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        if batch.num_rows == 0:
            return pa.table(
                {
                    "line": pa.array([], pa.string()),
                    "win_id": pa.array([], id_type),
                    "win_idx": pa.array([], pa.int64()),
                    "n_occ": pa.array([], pa.int64()),
                }
            )
        # ids are unique per row (doc key), so any sort by id yields the
        # (id, idx)-min-first traversal
        batch = batch.take(pc.sort_indices(batch[id_col]))
        texts = pc.fill_null(batch[text_col], "")
        parts = pc.split_pattern(texts, pattern="\n")
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(parts)
        total = int(counts.sum())
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        rep_ids = np.repeat(ids_np, counts)
        offs = np.cumsum(counts) - counts
        pos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        t = pa.table(
            {"line": flat,
             "trav": pa.array(np.arange(total, dtype=np.int64), pa.int64())}
        )
        agg = t.group_by("line").aggregate([("trav", "min"), ([], "count_all")])
        trav_min = agg["trav_min"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "line": agg["line"],
                "win_id": pa.array(rep_ids[trav_min].tolist(), id_type),
                "win_idx": pa.array(pos[trav_min], pa.int64()),
                "n_occ": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    return combine


def _resolve_block(batch: pa.Table) -> pa.Table:
    """Per-partition final winner resolve (a line key lives in exactly one
    partition after the keyed repartition): vectorized sort + group-boundary
    keep-first for the (win_id, win_idx) argmin, group_by sum for n_occ."""
    if batch.num_rows == 0:
        return batch
    idx = pc.sort_indices(
        batch,
        sort_keys=[("line", "ascending"), ("win_id", "ascending"),
                   ("win_idx", "ascending")],
    )
    s = batch.take(idx)
    lines = s["line"].combine_chunks()
    first = np.ones(len(s), dtype=bool)
    if len(s) > 1:
        first[1:] = ~pc.equal(lines.slice(1), lines.slice(0, len(s) - 1)).to_numpy(
            zero_copy_only=False
        )
    winners = s.filter(pa.array(first))
    counts = batch.group_by("line").aggregate([("n_occ", "sum")])
    pos = pc.index_in(winners["line"], counts["line"])
    total = pc.take(counts["n_occ_sum"], pos)
    return winners.set_column(
        winners.schema.get_field_index("n_occ"), "n_occ", total
    )


def line_winners(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int = 8,
) -> Dataset:
    """(line, win_id, win_idx, n_occ) for every distinct line in the corpus
    — combiner → one hash shuffle on the line key → vectorized resolve."""
    configure_data_context()
    combined = ds.map_batches(
        _occurrence_combiner(id_col, text_col), batch_format="pyarrow"
    )
    combined = combined.repartition(num_blocks=num_partitions, keys=["line"])
    return combined.map_batches(_resolve_block, batch_format="pyarrow",
                                batch_size=None)


# per-worker-process cache of the winner-side lookup structure (the
# pd.Index hash table is the expensive part, so build it once per worker,
# not once per batch)
_DUP_CACHE: dict[Any, tuple] = {}


def _split_flat(batch: pa.Table, id_col: str, text_col: str):
    """Shared vectorized explode: (flat_lines ChunkedArray, rep_ids np,
    pos np, counts np) — one Arrow split + flatten, positions via numpy
    offset arithmetic (no per-line Python loop)."""
    texts = pc.fill_null(batch[text_col], "")
    parts = pc.split_pattern(texts, pattern="\n")
    counts = pc.list_value_length(parts).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = pc.list_flatten(parts)
    total = int(counts.sum())
    ids_np = batch[id_col].to_numpy(zero_copy_only=False)
    rep_ids = np.repeat(ids_np, counts)
    offs = np.cumsum(counts) - counts
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
    return flat, rep_ids, pos, counts


def _keep_mask(
    flat_np: np.ndarray, rep_ids: np.ndarray, pos: np.ndarray,
    dup_index, win_id: np.ndarray, win_idx: np.ndarray,
) -> np.ndarray:
    """keep = line not duplicated, or this occurrence IS the winner."""
    if len(dup_index) == 0:
        return np.ones(len(flat_np), dtype=bool)
    gi = dup_index.get_indexer(flat_np)
    safe = np.where(gi < 0, 0, gi)
    return (gi < 0) | ((win_id[safe] == rep_ids) & (win_idx[safe] == pos))


def _join_kept(
    flat, keep: np.ndarray, counts: np.ndarray
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(text_deduped, n_kept, n_dropped) per doc — the per-doc join is
    one Arrow binary_join over a rebuilt list array, not a Python loop."""
    seg_starts = np.cumsum(counts) - counts
    kept_per_doc = np.add.reduceat(keep.astype(np.int64), seg_starts) \
        if len(counts) else np.zeros(0, dtype=np.int64)
    dropped = counts - kept_per_doc
    flat_kept = flat.filter(pa.array(keep))
    if isinstance(flat_kept, pa.ChunkedArray):
        flat_kept = flat_kept.combine_chunks()
    offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
    lst = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), flat_kept
    )
    return pc.binary_join(lst, "\n"), kept_per_doc, dropped


def _apply_broadcast(ds: Dataset, dup_ref, id_col: str, text_col: str) -> Dataset:
    def apply(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cached = _DUP_CACHE.get(dup_ref.hex())
        if cached is None:
            lines, win_id, win_idx = ray.get(dup_ref)
            cached = (pd.Index(lines, dtype=object), win_id, win_idx)
            _DUP_CACHE.clear()
            _DUP_CACHE[dup_ref.hex()] = cached
        dup_index, win_id, win_idx = cached
        flat, rep_ids, pos, counts = _split_flat(batch, id_col, text_col)
        flat_np = flat.to_numpy(zero_copy_only=False)
        keep = _keep_mask(flat_np, rep_ids, pos, dup_index, win_id, win_idx)
        text, kept_per_doc, dropped = _join_kept(flat, keep, counts)
        return pa.table(
            {
                id_col: batch[id_col],
                "text_deduped": text,
                "n_lines_kept": pa.array(kept_per_doc, pa.int64()),
                "n_lines_dropped": pa.array(dropped, pa.int64()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def _apply_distributed(
    ds: Dataset, dup_winners: Dataset, id_col: str, text_col: str,
    num_partitions: int,
) -> Dataset:
    """Any-scale apply: occurrence rows and dup-winner rows are tag-unioned
    and co-partitioned on the line key, the keep flag is decided partition-
    locally, then one keyed repartition on the doc id reassembles each doc
    in one partition. Ships each line's text twice (explode + reassembly
    shuffle) — the price of rewriting every document, same as C4 at scale."""
    id_type_holder: dict[str, pa.DataType] = {}

    def explode(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        flat, rep_ids, pos, _counts = _split_flat(batch, id_col, text_col)
        return pa.table(
            {
                "occ_id": pa.array(rep_ids.tolist(), id_type),
                "occ_idx": pa.array(pos, pa.int64()),
                "line": flat,
                "side": pa.array(np.zeros(len(pos), dtype=np.int8), pa.int8()),
            }
        )

    occ = ds.map_batches(explode, batch_format="pyarrow")
    # sniff the id type from the winners side for the tag-union schema
    def tag_winners(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "occ_id": batch["win_id"],
                "occ_idx": batch["win_idx"],
                "line": batch["line"],
                "side": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    win = dup_winners.map_batches(tag_winners, batch_format="pyarrow")
    unioned = occ.union(win).repartition(
        num_blocks=num_partitions, keys=["line"]
    )

    def decide(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty shuffle bundles may carry no schema at all (Ray 2.49)
            return batch
        import pandas as pd

        is_win = pc.equal(batch["side"], 1)
        wtbl = batch.filter(is_win)
        otbl = batch.filter(pc.invert(is_win))
        dup_index = pd.Index(
            wtbl["line"].to_numpy(zero_copy_only=False), dtype=object
        )
        keep = _keep_mask(
            otbl["line"].to_numpy(zero_copy_only=False),
            otbl["occ_id"].to_numpy(zero_copy_only=False),
            otbl["occ_idx"].to_numpy(zero_copy_only=False),
            dup_index,
            wtbl["occ_id"].to_numpy(zero_copy_only=False),
            wtbl["occ_idx"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"occ_id": otbl["occ_id"], "occ_idx": otbl["occ_idx"],
             "line": otbl["line"], "keep": pa.array(keep, pa.bool_())}
        )

    decided = unioned.map_batches(decide, batch_format="pyarrow",
                                  batch_size=None)
    decided = decided.repartition(num_blocks=num_partitions, keys=["occ_id"])

    def reassemble(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(
            batch, sort_keys=[("occ_id", "ascending"), ("occ_idx", "ascending")]
        )
        s = batch.take(idx)
        ids = s["occ_id"].combine_chunks()
        n = len(s)
        # doc boundaries: run-length on the sorted id column (vectorized
        # shift-compare, the _resolve_block idiom)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = ~pc.equal(
                ids.slice(1), ids.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        doc_start = np.flatnonzero(first)
        counts = np.diff(np.append(doc_start, n)).astype(np.int64)
        keep = s["keep"].to_numpy(zero_copy_only=False)
        text, kept_per_doc, dropped = _join_kept(
            s["line"].combine_chunks(), keep, counts
        )
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_start, pa.int64())),
                "text_deduped": text,
                "n_lines_kept": pa.array(kept_per_doc, pa.int64()),
                "n_lines_dropped": pa.array(dropped, pa.int64()),
            }
        )

    return decided.map_batches(reassemble, batch_format="pyarrow",
                               batch_size=None)


def line_dedup(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    broadcast_max_lines: int = BROADCAST_MAX_LINES,
    plan: str = "auto",
) -> Dataset:
    """C4-style corpus-global line dedup → Dataset(id_col, text_deduped,
    n_lines_kept, n_lines_dropped). ``plan``: 'auto' (bounded broadcast
    else distributed), 'broadcast', or 'distributed' (for tests)."""
    configure_data_context()
    winners = line_winners(ds, id_col, text_col, num_partitions)
    dup_winners = winners.map_batches(
        lambda b: b.filter(pc.greater(b["n_occ"], 1)).select(
            ["line", "win_id", "win_idx"]
        ),
        batch_format="pyarrow",
    ).materialize()

    if plan not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"unknown plan {plan!r}")
    use_broadcast = plan == "broadcast" or (
        plan == "auto" and dup_winners.count() <= broadcast_max_lines
    )
    if use_broadcast:
        # bounded by contract: dup-winner rows <= broadcast_max_lines
        tbl = pa.concat_tables(
            [pa.table(b) for b in dup_winners.iter_batches(batch_format="pyarrow")]
            or [pa.table({"line": pa.array([], pa.string()),
                          "win_id": pa.array([], pa.int64()),
                          "win_idx": pa.array([], pa.int64())})]
        )
        dup_ref = ray.put(
            (
                tbl["line"].to_numpy(zero_copy_only=False),
                tbl["win_id"].to_numpy(zero_copy_only=False),
                tbl["win_idx"].to_numpy(zero_copy_only=False),
            )
        )
        return _apply_broadcast(ds, dup_ref, id_col, text_col)
    return _apply_distributed(ds, dup_winners, id_col, text_col, num_partitions)
