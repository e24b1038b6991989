"""Sharded inverted-index build: token -> sorted posting list of doc
ids. The retrieval-index step a training-data platform runs over its
curated corpus (RAG stores, contamination lookups, concordance audits —
the classic sort-based index construction, cf. Manning et al., IIR ch.4
"BSBI/SPIMI": distribute postings by term, sort within term).

Scale shape:
1. per-batch combiner: DISTINCT (token, doc_id) pairs per batch (a doc's
   rows never split across batches, so per-doc distinctness is exact) —
   repeated tokens collapse before anything moves;
2. ONE hash repartition on the token key (``repartition(keys=...)`` —
   the engine's keyed-shuffle convention, cf. line_dedup);
3. partition-local finish inside ``map_batches``: pyarrow
   ``group_by(token).aggregate(doc_id: list)`` then a vectorized
   per-list sort — every posting row for a token lives in exactly one
   partition after the shuffle, so the group is complete.
Output Dataset(token, df:int64, postings:list<int64>), postings sorted
ascending — a deterministic, SQL-recomputable rendering
(``list(DISTINCT doc_id ORDER BY doc_id)``).

Posting lists are doc-frequency-bounded; a stopword's list over the full
corpus is the classic skew risk. ``max_postings`` caps the stored list
(keeping the SMALLEST doc ids — deterministic) while ``df`` always keeps
the TRUE count, so a capped term is visible as ``df > len(postings)``
(no-silent-caps rule); the driver contract runs uncapped (the oracle
recomputes full lists).

The reference has no index/retrieval surface (one document per Lambda);
beyond-reference training-data op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..context import configure_data_context
from .textstats import doc_token_counts


def build_inverted_index(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int = 8, max_postings: int | None = None,
) -> Dataset:
    """Dataset(token, df, postings) — see module docstring."""
    configure_data_context()

    def pairs(batch: pa.Table) -> pa.Table:
        # distinct (doc, token) pairs, vectorized (doc_token_counts —
        # the tf side is discarded; distinctness is exactly the posting
        # contract)
        pair_doc, pair_token, _tf, _dl = doc_token_counts(batch[text_col])
        return pa.table(
            {
                "token": pair_token,
                "doc_id": batch[id_col].take(
                    pa.array(pair_doc, pa.int64())
                ).cast(pa.int64()),
            }
        )

    posting_rows = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .repartition(num_blocks=num_partitions, keys=["token"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.list_(pa.int64())),
                }
            )
        grouped = batch.group_by("token").aggregate([("doc_id", "list")])
        tokens = grouped["token"]
        lists = [sorted(v) for v in grouped["doc_id_list"].to_pylist()]
        df = pa.array([len(v) for v in lists], pa.int64())
        if max_postings is not None:
            lists = [v[:max_postings] for v in lists]
        return pa.table(
            {
                "token": tokens,
                "df": df,
                "postings": pa.array(lists, pa.list_(pa.int64())),
            }
        )

    # batch_size=None: one batch per shuffled block, so every posting row
    # of a token is in the same `finish` call (group completeness)
    return posting_rows.map_batches(finish, batch_format="pyarrow",
                                    batch_size=None)


def lookup_postings(index: Dataset, tokens: list[str]) -> pa.Table:
    """Driver-side point lookup for a bounded token set (filter is
    pushed into every block scan; result is len(tokens)-bounded)."""
    import pyarrow.compute as pc

    tok_set = pa.array(tokens, pa.string())

    def probe(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["token"], value_set=tok_set))

    hits = index.map_batches(probe, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(hits, preserve_index=False)


def sql_inverted_index(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB recompute: postings = list(DISTINCT id ORDER BY id)."""
    toks = f"string_split_regex(trim(coalesce({text_col}, '')), '\\s+')"
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {id_col} AS doc_id, unnest({toks}) AS token
          FROM {table} WHERE trim(coalesce({text_col}, '')) <> ''
        )
        SELECT token,
               CAST(count(*) AS BIGINT) AS df,
               list(doc_id ORDER BY doc_id) AS postings
        FROM pairs GROUP BY token ORDER BY token
    """


def _np_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.intersect1d(a, b, assume_unique=True)


def conjunctive_query(index: Dataset, tokens: list[str]) -> list[int]:
    """AND-query: doc ids containing ALL tokens (sorted). Intersects the
    (bounded) looked-up posting lists smallest-first — the standard
    conjunctive-query optimization."""
    hits = lookup_postings(index, tokens)
    found = {t: np.asarray(p, dtype=np.int64)
             for t, p in zip(hits["token"].to_pylist(),
                             hits["postings"].to_pylist())}
    if len(found) < len(set(tokens)):
        return []  # some token absent from the corpus
    lists = sorted(found.values(), key=len)
    cur = lists[0]
    for nxt in lists[1:]:
        if cur.size == 0:
            break
        cur = _np_intersect(cur, nxt)
    return cur.tolist()
