"""Per-document TF-IDF top-k terms — the keyword/topic-signal extraction
step a training-data pipeline runs for corpus audits, topic balancing and
retrieval indexing (the classic BM25/tf-idf family, Sparck Jones 1972).

Contract (what the DuckDB oracle recomputes exactly):
- token model = the engine-wide contract (ops/textstats.tokenize:
  whitespace split after strip; '' / NULL -> no tokens);
- tf(d, t)  = occurrences of t in d;  df(t) = distinct docs containing t;
  N = total input rows (including token-less docs);
- score(d, t) = (tf * N) / df computed as ONE IEEE-754 double division of
  the exact integer tf*N (< 2^53 by contract) by the exact integer df —
  a single correctly-rounded operation, so numpy and DuckDB produce
  bit-identical doubles and identical rank order. This is the LINEAR-idf
  tf-idf variant, chosen deliberately: log-idf ranks identically for a
  fixed tf (log is monotone) but its last-ulp value is libm-dependent,
  which would make cross-engine rank parity unprovable. Documented
  trade-off; the ordering differs from log-idf only across tf levels.
- top-k per doc by (score DESC, token ASC); output one row per kept term:
  (doc_id, rank, token, tf, df, score), rank 1-based.

Scale shape:
1. df resolve: corpus_stats.token_df (per-batch combiner -> one
   token-hash shuffle) -> bounded vocabulary Dataset.
2. Apply:
   - broadcast plan (vocab <= ``broadcast_max_tokens``): the (token -> df)
     map is ``ray.put`` once; every batch recounts tf per doc and ranks
     locally — zero further shuffle;
   - distributed plan (above the bound): explode docs to (token, doc_id,
     tf) rows, tag-union with the df rows, co-partition on token
     (partition-local df attach — no Dataset.join, cf. span_dedup), then
     repartition the scored rows on doc_id and take top-k partition-
     locally. Both plans are equality-tested against each other and the
     SQL oracle.

Behavioral lineage: the reference has no corpus-level statistics at all
(one document per Lambda, src/ocr_processor/app.py:94-138); this op is
part of the engine's beyond-reference training-data surface.
"""

from __future__ import annotations

import heapq
from collections import Counter

import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .corpus_stats import token_df
from .textstats import tokenize

DEFAULT_K = 5
BROADCAST_MAX_TOKENS = 5_000_000


def _topk_rows(
    doc_id, counts: Counter, df_of, n_docs: int, k: int,
    out: dict[str, list],
) -> None:
    """Rank one doc's terms and append the top-k rows. ``df_of`` is any
    token -> df mapping getter (dict.get or partition-local dict)."""
    scored = []
    for tok, tf in counts.items():
        df = df_of(tok)
        if df is None:  # distributed plan: token outside this partition
            continue
        scored.append((-(tf * n_docs) / df, tok, tf, df))
    for rank, (neg_score, tok, tf, df) in enumerate(
        heapq.nsmallest(k, scored), start=1
    ):
        out["doc_id"].append(doc_id)
        out["rank"].append(rank)
        out["token"].append(tok)
        out["tf"].append(tf)
        out["df"].append(df)
        out["score"].append(-neg_score)


def _emit(out: dict[str, list], id_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], id_type),
            "rank": pa.array(out["rank"], pa.int64()),
            "token": pa.array(out["token"], pa.string()),
            "tf": pa.array(out["tf"], pa.int64()),
            "df": pa.array(out["df"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


def _new_out() -> dict[str, list]:
    return {c: [] for c in ("doc_id", "rank", "token", "tf", "df", "score")}


# per-worker cache of the deserialized vocabulary dict (same pattern as
# span_dedup._DUP_CACHE — spares the per-batch ray.get round trip)
_DF_CACHE: dict[str, dict] = {}


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
        df_map: dict[str, int] = {}
        for b in vocab.iter_batches(batch_format="pyarrow"):
            df_map.update(zip(b["token"].to_pylist(), b["df"].to_pylist()))
        df_ref = ray.put(df_map)

        def apply(batch: pa.Table) -> pa.Table:
            dfm = _DF_CACHE.get(df_ref.hex())
            if dfm is None:
                dfm = ray.get(df_ref)
                _DF_CACHE.clear()
                _DF_CACHE[df_ref.hex()] = dfm
            out = _new_out()
            for did, t in zip(batch[id_col].to_pylist(),
                              batch[text_col].to_pylist()):
                counts = Counter(tokenize(t))
                if counts:
                    _topk_rows(did, counts, dfm.get, n_docs, k, out)
            return _emit(out, id_type)

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
        o_tok, o_id, o_tf = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            for tok, tf in Counter(tokenize(t)).items():
                o_tok.append(tok)
                o_id.append(did)
                o_tf.append(tf)
        return pa.table(
            {
                "token": pa.array(o_tok, pa.string()),
                "occ_id": pa.array(o_id, id_type),
                "tf": pa.array(o_tf, pa.int64()),
                "df": pa.array([-1] * len(o_tok), pa.int64()),
                "side": pa.array([0] * len(o_tok), pa.int8()),
            }
        )

    def tag_vocab(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "token": batch["token"],
                "occ_id": pa.array([None] * n, id_type),
                "tf": pa.array([-1] * n, pa.int64()),
                "df": batch["df"],
                "side": pa.array([1] * n, pa.int8()),
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
        import pyarrow.compute as pc

        dfs = batch.filter(pc.equal(batch["side"], 1))
        local = dict(zip(dfs["token"].to_pylist(), dfs["df"].to_pylist()))
        occ = batch.filter(pc.equal(batch["side"], 0))
        return pa.table(
            {
                "occ_id": occ["occ_id"],
                "token": occ["token"],
                "tf": occ["tf"],
                "df": pa.array(
                    [local[t] for t in occ["token"].to_pylist()], pa.int64()
                ),
            }
        )

    scored = unioned.map_batches(attach_df, batch_format="pyarrow",
                                 batch_size=None)
    by_doc = scored.repartition(num_blocks=num_partitions, keys=["occ_id"])

    def finish(batch: pa.Table) -> pa.Table:
        out = _new_out()
        if batch.num_rows:
            per_doc: dict = {}
            for did, tok, tf, df in zip(
                batch["occ_id"].to_pylist(), batch["token"].to_pylist(),
                batch["tf"].to_pylist(), batch["df"].to_pylist(),
            ):
                per_doc.setdefault(did, []).append((tok, tf, df))
            for did, terms in per_doc.items():
                counts = Counter({tok: tf for tok, tf, _ in terms})
                local_df = {tok: df for tok, _, df in terms}
                _topk_rows(did, counts, local_df.get, n_docs, k, out)
        return _emit(out, id_type)

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
