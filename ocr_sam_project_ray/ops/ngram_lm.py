"""n-gram language-model familiarity scoring — the CCNet/DCLM model-based
quality-filter shape (Wenzek et al. 2020 "CCNet"; Li et al. 2024 "DCLM"):
train a count model on a reference corpus, broadcast it, and score every
document by how familiar its n-grams are. CCNet uses a KenLM 5-gram and
float perplexity; this engine keeps the same two-phase train→broadcast→
score topology but an INTEGER contract (the engine-wide float-parity rule,
cf. ops/quality.py): per doc,

- n_grams  = token-trigram occurrences (with multiplicity),
- n_hits   = occurrences whose gram is IN the model,
- hit_sum  = sum over occurrences of the model's corpus count for the gram

so the DuckDB oracle recomputes everything exactly (consumers derive the
float score, e.g. hit_sum/n_grams, downstream). Token model = the engine-
wide contract (ops/textstats.tokenize); gram = three tokens joined by one
space (a plain string, so the SQL oracle builds the identical key).

Scale shape:
- TRAIN: per-batch vectorized combiner (flat Arrow trigrams → one
  dictionary_encode + bincount; repeated boilerplate grams
  collapse before the shuffle) → one hash shuffle on the gram key →
  vectorized count sum → ``count >= min_count`` prune. min_count pruning
  is the standard LM-table bound: the surviving model is sized by the
  corpus's REPEATED phrase mass, not its length.
- SCORE, broadcast plan (model rows <= ``broadcast_max_grams``): the
  pruned model dict is ``ray.put`` once; every batch scores locally —
  zero shuffle, the default for any realistically pruned model.
- SCORE, distributed plan (above the bound): doc grams and model rows are
  tag-unioned and co-partitioned on the gram key (partition-local lookup,
  no Dataset.join — the Ray 2.49 empty-block trap, cf. ops/graph.py),
  partial per-doc sums then one keyed repartition on the doc id folds the
  per-doc base row (n_grams, 0, 0) with the per-partition hit rows.

Training on one dataset and scoring another (the real CCNet deployment:
train on Wikipedia, score Common Crawl) is the ``model_ds`` parameter of
``score_trigram_model``; the self-familiarity convenience wrapper
(``trigram_familiarity``) trains and scores the same corpus, which is what
the SQL oracle recomputes end to end.

The reference has no corpus-level modeling at all (one document per
Lambda); this op is part of the engine's beyond-reference training-data
surface.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .textstats import flat_tokens, ngrams_from_flat, tokenize

MIN_COUNT = 3
# same bound family as line_dedup.BROADCAST_MAX_LINES / stages/dedup.py
BROADCAST_MAX_GRAMS = 5_000_000


def doc_trigrams(text: str | None) -> list[str]:
    """Token trigrams WITH multiplicity, each 'w1 w2 w3' (< 3 tokens → [])."""
    toks = tokenize(text)
    return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]


def train_trigram_model(
    ds: Dataset, text_col: str = "text", min_count: int = MIN_COUNT,
    num_partitions: int = 8,
) -> Dataset:
    """(gram, c): corpus occurrence count per distinct trigram, pruned to
    c >= min_count — combiner → one gram-key shuffle → sum → prune."""
    configure_data_context()

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized combiner: flat trigrams (textstats.ngrams_from_flat)
        # -> one dictionary_encode + one bincount per batch
        _dl, flat, doc_idx = flat_tokens(batch[text_col])
        grams, _gdoc = ngrams_from_flat(flat, doc_idx, 3)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(grams)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gram": enc.dictionary,
                "c": pa.array(
                    np.bincount(codes, minlength=len(enc.dictionary)),
                    pa.int64(),
                ),
            }
        )

    from ray.data.aggregate import Sum

    model = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="c"))
    )
    return model.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_count)),
        batch_format="pyarrow",
    )


# per-worker-process cache of the deserialized model dict (not zero-copy)
_MODEL_CACHE: dict[Any, dict] = {}


def _score_broadcast(ds: Dataset, model_ref, id_col: str, text_col: str) -> Dataset:
    def score(batch: pa.Table) -> pa.Table:
        model = _MODEL_CACHE.get(model_ref.hex())
        if model is None:
            model = ray.get(model_ref)
            _MODEL_CACHE.clear()
            _MODEL_CACHE[model_ref.hex()] = model
        m_grams, m_c = model
        n_docs = batch.num_rows
        dl, flat, doc_idx = flat_tokens(batch[text_col])
        grams, gdoc = ngrams_from_flat(flat, doc_idx, 3)
        n_grams = np.maximum(dl - 2, 0)
        n_hits = np.zeros(n_docs, dtype=np.int64)
        hit_sum = np.zeros(n_docs, dtype=np.int64)
        if len(grams):
            # one hash lookup against the broadcast model table
            pos = pc.fill_null(
                pc.index_in(grams, value_set=m_grams), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = pos >= 0
            gh = gdoc[hit]
            if gh.size:
                n_hits = np.bincount(gh, minlength=n_docs)
                # gdoc is non-decreasing (row-major grams): exact int64
                # segment sums via reduceat — no float accumulation
                cv = m_c[pos[hit]]
                starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
                hit_sum[gh[starts]] = np.add.reduceat(cv, starts)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "hit_sum": pa.array(hit_sum, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _score_distributed(
    ds: Dataset, model: Dataset, id_col: str, text_col: str, num_partitions: int,
) -> Dataset:
    """Any-scale score: (doc, gram, mult) partials and model rows are
    co-partitioned on the gram key, hit sums fold partition-locally, then
    one doc-key repartition merges them with the per-doc base rows."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_col = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray
        ) else batch[id_col]
        id_type = batch.schema.field(id_col).type
        n_rows = batch.num_rows
        # vectorized per-(doc, gram) multiplicities: flat trigrams ->
        # dictionary codes -> one np.unique over int64 composite keys
        # (the textstats.doc_token_counts idiom, lifted to trigrams)
        dl, flat, doc_idx = flat_tokens(batch[text_col])
        grams, gdoc = ngrams_from_flat(flat, doc_idx, 3)
        if len(grams):
            enc = pc.dictionary_encode(grams)
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            ndict = len(enc.dictionary)
            uk, mult = np.unique(gdoc * ndict + codes, return_counts=True)
            pair_doc = uk // ndict
            o_gram = enc.dictionary.take(pa.array(uk % ndict, pa.int64()))
            o_id = ids_col.take(pa.array(pair_doc, pa.int64()))
            o_mult = mult.astype(np.int64)
        else:
            o_gram = pa.array([], pa.string())
            o_id = pa.array([], id_type)
            o_mult = np.zeros(0, np.int64)
        base_n = np.maximum(dl - 2, 0)
        # side 0 = per-(doc, gram) multiplicities; side 2 = per-doc base
        # rows (n_grams totals). Base rows ride the same union under a
        # per-doc routing key ('\\x00'+id — the gram column is ONLY a
        # shuffle key for them, side disambiguates roles) so they spread
        # evenly instead of piling one hot partition.
        base_gram = pc.binary_join_element_wise(
            pa.array(["\x00"] * n_rows, pa.string()),
            pc.cast(ids_col, pa.string()), ""
        )
        return pa.table(
            {
                "doc": pa.concat_arrays([o_id.combine_chunks() if isinstance(
                    o_id, pa.ChunkedArray) else o_id, ids_col]),
                "gram": pa.concat_arrays([
                    o_gram.combine_chunks() if isinstance(
                        o_gram, pa.ChunkedArray) else o_gram, base_gram]),
                "v": pa.array(np.concatenate([o_mult, base_n]), pa.int64()),
                "side": pa.array(
                    np.concatenate([np.zeros(len(o_mult), np.int8),
                                    np.full(n_rows, 2, np.int8)]), pa.int8()
                ),
            }
        )

    occ = ds.map_batches(explode, batch_format="pyarrow")
    sch = occ.schema()
    id_type = dict(zip(sch.names, sch.types))["doc"]

    def tag_model(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc": pa.nulls(batch.num_rows, id_type),
                "gram": batch["gram"],
                "v": batch["c"],
                "side": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    tagged = occ.union(model.map_batches(tag_model, batch_format="pyarrow"))
    by_gram = tagged.repartition(num_blocks=num_partitions, keys=["gram"])

    def fold_gram(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        side = batch["side"]
        model_tbl = batch.filter(pc.equal(side, 1))
        occ_tbl = batch.filter(pc.equal(side, 0))
        base = batch.filter(pc.equal(side, 2))
        # vectorized model lookup: occurrence gram → model row index
        pos = pc.index_in(occ_tbl["gram"], model_tbl["gram"].combine_chunks())
        hit_mask = pc.is_valid(pos)
        hits = occ_tbl.filter(hit_mask)
        c = pc.take(model_tbl["v"], pos.filter(hit_mask))
        mult = hits["v"]
        return pa.table(
            {
                "doc": pa.concat_arrays(
                    [hits["doc"].combine_chunks(), base["doc"].combine_chunks()]
                ),
                "n_grams": pa.concat_arrays(
                    [pa.nulls(hits.num_rows, pa.int64()).fill_null(0),
                     base["v"].combine_chunks()]
                ),
                "n_hits": pa.concat_arrays(
                    [mult.combine_chunks(),
                     pa.nulls(base.num_rows, pa.int64()).fill_null(0)]
                ),
                "hit_sum": pa.concat_arrays(
                    [pc.multiply_checked(mult, c).combine_chunks(),
                     pa.nulls(base.num_rows, pa.int64()).fill_null(0)]
                ),
            }
        )

    folded = by_gram.map_batches(fold_gram, batch_format="pyarrow",
                                 batch_size=None)
    by_doc = folded.repartition(num_blocks=num_partitions, keys=["doc"])

    def fold_doc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        agg = batch.group_by("doc").aggregate(
            [("n_grams", "sum"), ("n_hits", "sum"), ("hit_sum", "sum")]
        )
        return pa.table(
            {
                id_col: agg["doc"],
                "n_grams": agg["n_grams_sum"],
                "n_hits": agg["n_hits_sum"],
                "hit_sum": agg["hit_sum_sum"],
            }
        )

    return by_doc.map_batches(fold_doc, batch_format="pyarrow", batch_size=None)


def score_trigram_model(
    ds: Dataset,
    model_ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    broadcast_max_grams: int = BROADCAST_MAX_GRAMS,
    plan: str = "auto",
) -> Dataset:
    """Score ``ds`` against a trained (gram, c) model → Dataset(id_col,
    n_grams, n_hits, hit_sum). ``plan``: 'auto' | 'broadcast' |
    'distributed' (tests exercise both)."""
    configure_data_context()
    if plan not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"unknown plan {plan!r}")
    model_ds = model_ds.materialize()
    use_broadcast = plan == "broadcast" or (
        plan == "auto" and model_ds.count() <= broadcast_max_grams
    )
    if use_broadcast:
        # bounded by contract: pruned model rows <= broadcast_max_grams.
        # Shipped as (gram Arrow array, c int64 vector) — index_in-ready,
        # no Python dict materializes anywhere
        g_parts, c_parts = [], []
        for b in model_ds.iter_batches(batch_format="pyarrow"):
            g_parts.append(pa.table(b)["gram"].combine_chunks())
            c_parts.append(
                pa.table(b)["c"].to_numpy(zero_copy_only=False)
            )
        m_grams = (
            pa.concat_arrays(g_parts) if g_parts
            else pa.array([], pa.string())
        )
        m_c = (
            np.concatenate(c_parts).astype(np.int64) if c_parts
            else np.zeros(0, np.int64)
        )
        return _score_broadcast(ds, ray.put((m_grams, m_c)), id_col, text_col)
    return _score_distributed(ds, model_ds, id_col, text_col, num_partitions)


def trigram_familiarity(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = MIN_COUNT,
    num_partitions: int = 8,
    plan: str = "auto",
) -> Dataset:
    """Self-familiarity: train on the corpus, score the same corpus — the
    SQL-oracle-certified composition. Real deployments pass a separate
    high-quality reference corpus to train_trigram_model instead."""
    model = train_trigram_model(ds, text_col, min_count, num_partitions)
    return score_trigram_model(ds, model, id_col, text_col, num_partitions,
                               plan=plan)


BUCKET_LABELS = {1: "head", 2: "middle", 3: "tail"}


def familiarity_buckets(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = MIN_COUNT,
    num_partitions: int = 8,
) -> Dataset:
    """CCNet's head/middle/tail corpus split, exact: score every doc with
    the integer familiarity contract, reduce to ``ppm = (hit_sum *
    1_000_000) // n_grams`` (-1 when the doc has no grams), and assign
    EXACT terciles by (ppm DESC, id) with ops/ranking's no-global-sort
    NTILE — bucket 'head' = most familiar third (CCNet keeps 'head' +
    'middle' for training). Dataset(id, ppm, bucket).

    One derived integer sort key → the DuckDB oracle is a plain
    NTILE(3) OVER (ORDER BY -ppm, id) recompute."""
    from .ranking import global_rank_ntile

    scored = trigram_familiarity(ds, id_col, text_col, min_count,
                                 num_partitions)

    def key(batch: pa.Table) -> pa.Table:
        ng = batch["n_grams"].to_numpy(zero_copy_only=False)
        hs = batch["hit_sum"].to_numpy(zero_copy_only=False)
        import numpy as np

        ppm = np.full(len(ng), -1, dtype=np.int64)
        nz = ng > 0
        ppm[nz] = (hs[nz] * 1_000_000) // ng[nz]
        return pa.table({id_col: batch[id_col],
                         "negppm": pa.array(-ppm, pa.int64())})

    ranked = global_rank_ntile(
        scored.map_batches(key, batch_format="pyarrow"),
        key_col="negppm", id_col=id_col, k=3,
        num_partitions=num_partitions,
    )

    labels = pa.array([BUCKET_LABELS[i] for i in (1, 2, 3)], pa.string())

    def out(batch: pa.Table) -> pa.Table:
        ppm = pc.multiply(batch["negppm"], pa.scalar(-1, pa.int64()))
        bucket = labels.take(pc.subtract(batch["ntile"],
                                         pa.scalar(1, pa.int64())))
        return pa.table({id_col: batch[id_col], "ppm": ppm,
                         "bucket": bucket})

    return ranked.map_batches(out, batch_format="pyarrow")


def sql_familiarity_buckets(table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            min_count: int = MIN_COUNT) -> str:
    """DuckDB recompute: the trigram_lm_score chain + ppm + NTILE(3)."""
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 string_split_regex(trim(coalesce({text_col}, '')), '\\s+') AS ws
          FROM {table}
        ),
        grams AS (
          SELECT {id_col}, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
          FROM toks, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
        ),
        model AS (
          SELECT gram, CAST(count(*) AS BIGINT) AS c
          FROM grams GROUP BY gram HAVING count(*) >= {min_count}
        ),
        hits AS (
          SELECT g.{id_col}, count(*) AS n_grams,
                 coalesce(sum(m.c), 0) AS hit_sum
          FROM grams g LEFT JOIN model m USING (gram) GROUP BY g.{id_col}
        ),
        ppms AS (
          SELECT d.{id_col},
                 CASE WHEN coalesce(h.n_grams, 0) = 0 THEN -1
                      ELSE (h.hit_sum * 1000000) // h.n_grams
                 END AS ppm
          FROM {table} d LEFT JOIN hits h USING ({id_col})
        )
        SELECT {id_col}, CAST(ppm AS BIGINT) AS ppm,
               CASE NTILE(3) OVER (ORDER BY -ppm, {id_col})
                 WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
               END AS bucket
        FROM ppms
    """
