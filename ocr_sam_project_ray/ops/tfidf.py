"""Per-document TF-IDF top-k terms — the keyword/topic-signal extraction
step a training-data pipeline runs for corpus audits, topic balancing and
retrieval indexing (the classic BM25/tf-idf family, Sparck Jones 1972).

Contract (what the DuckDB oracle recomputes exactly):
- token model = the engine-wide contract (ops/textstats.tokenize:
  whitespace split after strip; '' / NULL -> no tokens);
- tf(d, t)  = occurrences of t in d;  df(t) = distinct docs containing t;
  N = total input rows (including token-less docs);
- score(d, t) = (tf * N) / df rendered EXACTLY as the oracle's
  ``CAST(tf * N AS DOUBLE) / df``: the int64 product converts to double
  (exact below 2^53 — guarded loudly), then ONE correctly-rounded IEEE
  division, so numpy and DuckDB produce bit-identical doubles and
  identical rank order. This is the LINEAR-idf tf-idf variant, chosen
  deliberately: log-idf ranks identically for a fixed tf (log is
  monotone) but its last-ulp value is libm-dependent, which would make
  cross-engine rank parity unprovable. Documented trade-off; the
  ordering differs from log-idf only across tf levels.
- top-k per doc by (score DESC, token ASC); output one row per kept term:
  (doc_id, rank, token, tf, df, score), rank 1-based.

Scale shape:
1. df resolve: corpus_stats.token_df (per-batch combiner -> one
   token-hash shuffle) -> bounded vocabulary Dataset.
2. Apply:
   - broadcast plan (vocab <= ``broadcast_max_tokens``): the vocabulary
     is ``ray.put`` once as (token array, df vector); every batch
     recounts tf per doc and ranks locally — zero further shuffle;
   - distributed plan (above the bound): explode docs to (token, doc_id,
     tf) rows, tag-union with the df rows, co-partition on token
     (partition-local df attach — no Dataset.join, cf. span_dedup), then
     repartition the scored rows on doc_id and take top-k partition-
     locally. Both plans are equality-tested against each other and the
     SQL oracle.

Every per-batch kernel is vectorized (round 5): tokenize + per-(doc,
token) counting is textstats.doc_token_counts (Arrow split/flatten +
one dictionary_encode + one np.unique — no Python strings, no per-row
Counter), df attach is one ``pc.index_in`` hash lookup, and per-doc
top-k is one multi-key ``pc.sort_indices`` + a segment-rank filter
instead of a per-doc heapq loop.

Behavioral lineage: the reference has no corpus-level statistics at all
(one document per Lambda, src/ocr_processor/app.py:94-138); this op is
part of the engine's beyond-reference training-data surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .corpus_stats import token_df
from .textstats import doc_token_counts

DEFAULT_K = 5
BROADCAST_MAX_TOKENS = 5_000_000


def _score(tf: np.ndarray, df: np.ndarray, n_docs: int) -> np.ndarray:
    """The contract's exact float rendering: int64 tf*N, cast to double,
    ONE division. Loud guard at the 2^53 exact-conversion bound (the
    oracle's CAST would silently round above it — raising keeps the
    cross-engine bit-parity claim honest)."""
    prod = tf * np.int64(n_docs)
    if prod.size and int(prod.max()) >= 2 ** 53:
        raise ValueError(
            "tfidf contract exceeded 2^53 (tf * N no longer converts to "
            "double exactly) — cross-engine bit parity would be lost"
        )
    return prod.astype(np.float64) / df.astype(np.float64)


def _rank_topk(
    tbl: pa.Table, g: np.ndarray, k: int
) -> tuple[pa.Table, np.ndarray]:
    """Per-group top-k by (score DESC, token ASC) over pair rows.
    ``g`` is an int64 group id aligned with ``tbl`` rows. One multi-key
    Arrow sort + a vectorized segment-rank; returns (kept rows sorted by
    (g, rank), their 1-based ranks)."""
    tbl = tbl.append_column("g", pa.array(g, pa.int64()))
    idx = pc.sort_indices(
        tbl,
        sort_keys=[("g", "ascending"), ("score", "descending"),
                   ("token", "ascending")],
    )
    tbl = tbl.take(idx)
    gs = tbl["g"].to_numpy(zero_copy_only=False)
    new = np.ones(len(gs), dtype=bool)
    new[1:] = gs[1:] != gs[:-1]
    starts = np.flatnonzero(new)
    gi = np.cumsum(new) - 1
    rank = np.arange(len(gs), dtype=np.int64) - starts[gi] + 1
    keep = rank <= k
    return tbl.filter(pa.array(keep)), rank[keep]


def _emit(
    doc_ids: pa.Array, rank: np.ndarray, pairs: pa.Table,
    id_type: pa.DataType,
) -> pa.Table:
    return pa.table(
        {
            "doc_id": doc_ids.cast(id_type),
            "rank": pa.array(rank, pa.int64()),
            "token": pairs["token"],
            "tf": pairs["tf"],
            "df": pairs["df"],
            "score": pairs["score"],
        }
    )


def _typed_empty(id_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], id_type),
            "rank": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


# per-worker cache of the deserialized vocabulary (same pattern as
# span_dedup._DUP_CACHE — spares the per-batch ray.get round trip)
_DF_CACHE: dict[str, tuple] = {}


def tfidf_topk(
    ds: Dataset, k: int = DEFAULT_K, id_col: str = "doc_id",
    text_col: str = "text", num_partitions: int = 8,
    broadcast_max_tokens: int = BROADCAST_MAX_TOKENS, plan: str = "auto",
) -> Dataset:
    """Top-k tf-idf terms per document -> Dataset(doc_id, rank, token,
    tf, df, score)."""
    configure_data_context()
    if plan not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"unknown plan {plan!r}")
    n_docs = ds.count()
    vocab = token_df(ds, id_col=id_col, text_col=text_col,
                     num_partitions=num_partitions).materialize()
    id_type = ds.schema().base_schema.field(id_col).type

    use_broadcast = plan == "broadcast" or (
        plan == "auto" and vocab.count() <= broadcast_max_tokens
    )
    if use_broadcast:
        # bounded by contract: vocabulary <= broadcast_max_tokens entries
        tok_parts, df_parts = [], []
        for b in vocab.iter_batches(batch_format="pyarrow"):
            tok_parts.append(b["token"])
            df_parts.append(b["df"].to_numpy(zero_copy_only=False))
        vocab_tokens = (
            pa.concat_arrays([c.combine_chunks() if isinstance(
                c, pa.ChunkedArray) else c for c in tok_parts])
            if tok_parts else pa.array([], pa.string())
        )
        vocab_df = (
            np.concatenate(df_parts).astype(np.int64)
            if df_parts else np.zeros(0, np.int64)
        )
        df_ref = ray.put((vocab_tokens, vocab_df))

        def apply(batch: pa.Table) -> pa.Table:
            vt = _DF_CACHE.get(df_ref.hex())
            if vt is None:
                vt = ray.get(df_ref)
                _DF_CACHE.clear()
                _DF_CACHE[df_ref.hex()] = vt
            v_tokens, v_df = vt
            pair_doc, pair_token, pair_tf, _dl = doc_token_counts(
                batch[text_col]
            )
            if len(pair_token) == 0:
                return _typed_empty(id_type)
            # vocabulary was computed from this same dataset under the
            # same token contract, so every token hits; the fill_null(-1)
            # + filter is structural safety only
            vid = pc.fill_null(
                pc.index_in(pair_token, value_set=v_tokens), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = vid >= 0
            if not hit.all():
                pair_doc = pair_doc[hit]
                pair_token = pair_token.filter(pa.array(hit))
                pair_tf = pair_tf[hit]
                vid = vid[hit]
            df_v = v_df[vid]
            pairs = pa.table({
                "token": pair_token,
                "tf": pa.array(pair_tf, pa.int64()),
                "df": pa.array(df_v, pa.int64()),
                "score": pa.array(_score(pair_tf, df_v, n_docs),
                                  pa.float64()),
            })
            kept, rank = _rank_topk(pairs, pair_doc, k)
            doc_ids = batch[id_col].take(kept["g"])
            return _emit(doc_ids, rank, kept, id_type)

        return ds.map_batches(apply, batch_format="pyarrow")

    return _tfidf_distributed(ds, vocab, k, id_col, text_col, n_docs,
                              num_partitions, id_type)


def _tfidf_distributed(
    ds: Dataset, vocab: Dataset, k: int, id_col: str, text_col: str,
    n_docs: int, num_partitions: int, id_type: pa.DataType,
) -> Dataset:
    """Any-scale plan: (token, doc_id, tf) occurrence rows tag-unioned with
    the (token, df) vocabulary and co-partitioned on token; scored rows
    then co-partitioned on doc_id where a per-doc top-k runs with the
    GLOBAL candidate set for that doc (every term of a doc arrives — each
    term was scored in exactly one token partition)."""

    def explode(batch: pa.Table) -> pa.Table:
        pair_doc, pair_token, pair_tf, _dl = doc_token_counts(
            batch[text_col]
        )
        n = len(pair_token)
        return pa.table(
            {
                "token": pair_token,
                "occ_id": batch[id_col].take(
                    pa.array(pair_doc, pa.int64())
                ),
                "tf": pa.array(pair_tf, pa.int64()),
                "df": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    def tag_vocab(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "token": batch["token"],
                "occ_id": pa.nulls(n, id_type),
                "tf": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "df": batch["df"],
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    unioned = ds.map_batches(explode, batch_format="pyarrow").union(
        vocab.map_batches(tag_vocab, batch_format="pyarrow")
    ).repartition(num_blocks=num_partitions, keys=["token"])

    def attach_df(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"occ_id": pa.array([], id_type),
                 "token": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()),
                 "df": pa.array([], pa.int64())}
            )
        dfs = batch.filter(pc.equal(batch["side"], 1))
        occ = batch.filter(pc.equal(batch["side"], 0))
        # partition-local vectorized lookup: co-partitioning on token
        # guarantees every occurrence's df row landed here, so index_in
        # always hits (fill_null(-1) is structural safety only)
        d_tok = dfs["token"].combine_chunks()
        vid = pc.fill_null(
            pc.index_in(occ["token"], value_set=d_tok), -1
        )
        return pa.table(
            {
                "occ_id": occ["occ_id"],
                "token": occ["token"],
                "tf": occ["tf"],
                "df": dfs["df"].combine_chunks().take(vid),
            }
        )

    scored = unioned.map_batches(attach_df, batch_format="pyarrow",
                                 batch_size=None)
    by_doc = scored.repartition(num_blocks=num_partitions, keys=["occ_id"])

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _typed_empty(id_type)
        # group ids via dictionary codes — grouping only; output order
        # within the batch is contract-free (consumers sort)
        enc = batch["occ_id"].combine_chunks().dictionary_encode()
        g = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        df = batch["df"].to_numpy(zero_copy_only=False)
        pairs = pa.table({
            "token": batch["token"],
            "tf": batch["tf"],
            "df": batch["df"],
            "score": pa.array(_score(tf, df, n_docs), pa.float64()),
        })
        kept, rank = _rank_topk(pairs, g, k)
        doc_ids = enc.dictionary.take(kept["g"].cast(pa.int32()))
        return _emit(doc_ids, rank, kept, id_type)

    return by_doc.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def sql_tfidf_topk(
    k: int = DEFAULT_K, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB recompute — same linear-idf contract, same single-division
    float shape (CAST(tf * N AS DOUBLE) / df)."""
    return f"""
        WITH tok AS (
          SELECT {id_col}, unnest(
                   string_split_regex(trim({text_col}), '\\s+')
                 ) AS token
          FROM {table}
          WHERE trim(coalesce({text_col}, '')) <> ''
        ),
        tf AS (
          SELECT {id_col}, token, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY {id_col}, token
        ),
        df AS (
          SELECT token, CAST(count(DISTINCT {id_col}) AS BIGINT) AS df
          FROM tok GROUP BY token
        ),
        n AS (SELECT count(*) AS n_docs FROM {table}),
        ranked AS (
          SELECT tf.{id_col}, tf.token, tf.tf, df.df,
                 CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
                 row_number() OVER (
                   PARTITION BY tf.{id_col}
                   ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC,
                            tf.token
                 ) AS rnk
          FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT {id_col}, CAST(rnk AS BIGINT) AS rank, token, tf, df, score
        FROM ranked WHERE rnk <= {k}
    """
