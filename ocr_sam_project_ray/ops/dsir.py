"""DSIR-style data selection: hashed n-gram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — the DataComp-LM / pretraining-curation standard for
"pick raw documents that look like the target corpus").

Method (faithful to the published recipe):
- features = unigrams + token-bigrams hashed into ``N_BUCKETS`` buckets
  (the paper's hashed n-gram generative model);
- fit two bag-of-features count models in ONE streaming pass: the TARGET
  model over the rows matching ``target_filter`` (here: a lang value —
  the paper's "target = formal text" setup) and the RAW/background model
  over every row;
- per-document importance weight = sum over feature occurrences of
  log p_target(f) - log p_raw(f), with add-one smoothing.

Engine-wide float-parity contract: the per-FEATURE log-likelihood ratio
is computed once (the feature table is a fixed ``N_BUCKETS`` vector, not
data-sized) and rounded to an INTEGER micro-nat scale,

    llr_i = floor(1e6 * (ln(t_i+1) - ln(T+B) - ln(r_i+1) + ln(R+B)) + 0.5)

so every per-document score is an exact int64 dot product — order-
independent, overflow-safe (|llr| < 40e6, counts < 2^20), and the DuckDB
oracle recomputes it with the identical expression tree. The ONLY
engine/oracle divergence risk is the floor boundary of the feature table
itself: numpy and DuckDB ``ln`` agree to <=1 ulp on this platform
(measured), so a disagreement needs ``1e6*llr + 0.5`` within ~1e-9 of an
integer for one of the N_BUCKETS values — vanishing, and check_oracle
would surface it deterministically before any submission.

Feature hash = md5 (the engine's deterministic-hash rule AND the reason
the SQL oracle can rebuild the identical buckets:
``CAST('0x' || substr(md5(gram),1,8) AS BIGINT) % N_BUCKETS``). md5 is
computed once per DISTINCT gram per batch; at 100 TB the hash can swap
to the vectorized splitmix64 family (ops/bloom.py) at the cost of a
non-SQL-checkable bucket map.

Scale shape:
- FIT: per-batch partial = two fixed 8*N_BUCKETS-byte count vectors
  (target, raw) + scalar totals; the driver folds n_batches fixed-size
  rows (the HLL/CMS merge pattern — elementwise sum, order-insensitive).
  Nothing vocabulary-sized ever moves.
- SCORE: the int64 llr table (64 KB) is ``ray.put`` once; every batch
  scores locally via one numpy gather + dot — zero shuffle.

The reference has no corpus-level modeling (one document per Lambda,
src/ocr_processor/app.py:94-138); this op is part of the engine's
beyond-reference training-data surface.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .textstats import flat_tokens, ngrams_from_flat, tokenize

N_BUCKETS = 8192
LLR_SCALE = 1_000_000  # micro-nats


def doc_feature_counts(text: str | None) -> Counter:
    """Hashed unigram+bigram bucket counts for one document — the scalar
    reference rendering (the batch path is _batch_buckets; they are
    equality-tested in test_dsir)."""
    toks = tokenize(text)
    grams = toks + [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    buckets: Counter = Counter()
    local: dict[str, int] = {}
    for g in grams:
        b = local.get(g)
        if b is None:
            b = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) \
                % N_BUCKETS
            local[g] = b
        buckets[b] += 1
    return buckets


def _batch_buckets(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bucket, occ_doc, dl) for one batch: every unigram+bigram
    occurrence's hashed bucket and its row index, vectorized. Gram
    construction is the shared Arrow kernel (textstats.flat_tokens /
    ngrams_from_flat — no per-row Python); md5 runs ONCE per distinct
    gram in the batch (dictionary_encode collapses repeats — boilerplate
    corpora hash far fewer grams than they contain)."""
    dl, flat, doc_idx = flat_tokens(col)
    bigrams, bdoc = ngrams_from_flat(flat, doc_idx, 2)
    grams = pa.concat_arrays([
        flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
        else flat,
        bigrams,
    ])
    occ_doc = np.concatenate([doc_idx, bdoc])
    if len(grams) == 0:
        return np.zeros(0, np.int64), occ_doc, dl
    enc = pc.dictionary_encode(grams)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_buckets = np.fromiter(
        (
            int(hashlib.md5(g).hexdigest()[:8], 16) % N_BUCKETS
            for g in _dict_utf8(enc.dictionary)
        ),
        dtype=np.int64, count=len(enc.dictionary),
    )
    return dict_buckets[codes], occ_doc, dl


def _dict_utf8(arr: pa.Array):
    """Yield each dictionary entry as utf-8 bytes without building the
    intermediate str: slice straight out of the Arrow data buffer."""
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(bufs[1], odt)[arr.offset: arr.offset + len(arr) + 1]
    mv = memoryview(bufs[2])
    for i in range(len(arr)):
        yield bytes(mv[off[i]: off[i + 1]])


def fit_models(
    ds: Dataset, text_col: str, target_filter_col: str,
    target_filter_value: str,
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass -> (target_counts, raw_counts), each an int64
    vector of length N_BUCKETS. Driver folds one fixed-size row per batch."""
    configure_data_context()

    def partial(batch: pa.Table) -> pa.Table:
        buckets, occ_doc, _dl = _batch_buckets(batch[text_col])
        raw = np.bincount(buckets, minlength=N_BUCKETS).astype(np.int64)
        in_tgt = pc.fill_null(
            pc.equal(batch[target_filter_col], target_filter_value), False
        ).to_numpy(zero_copy_only=False)
        in_tgt = np.asarray(in_tgt, dtype=bool)
        tmask = in_tgt[occ_doc] if len(occ_doc) else np.zeros(0, bool)
        tgt = np.bincount(
            buckets[tmask], minlength=N_BUCKETS
        ).astype(np.int64)
        return pa.table(
            {
                "tgt": pa.array([tgt.tobytes()], pa.binary()),
                "raw": pa.array([raw.tobytes()], pa.binary()),
            }
        )

    tgt = np.zeros(N_BUCKETS, dtype=np.int64)
    raw = np.zeros(N_BUCKETS, dtype=np.int64)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow"):
        for t, r in zip(b["tgt"].to_pylist(), b["raw"].to_pylist()):
            tgt += np.frombuffer(t, dtype=np.int64)
            raw += np.frombuffer(r, dtype=np.int64)
    return tgt, raw


def llr_table(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """Integer micro-nat log-likelihood-ratio table (int64[N_BUCKETS]).

    The expression tree below is mirrored VERBATIM by sql_dsir_score —
    same operand order, so both sides see the same <=1-ulp ln inputs."""
    t_total = int(tgt.sum())
    r_total = int(raw.sum())
    llr = (
        np.log((tgt + 1).astype(np.float64))
        - np.log(float(t_total + N_BUCKETS))
        - np.log((raw + 1).astype(np.float64))
        + np.log(float(r_total + N_BUCKETS))
    )
    return np.floor(LLR_SCALE * llr + 0.5).astype(np.int64)


def dsir_score(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    target_filter_col: str = "lang", target_filter_value: str = "en",
) -> Dataset:
    """Score every document against the target distribution.

    Returns Dataset(doc_id, n_feats:int64, dsir_score:int64) where
    dsir_score is the micro-nat importance weight (divide by 1e6 for
    nats; resample downstream by score order or Gumbel top-k)."""
    configure_data_context()
    tgt, raw = fit_models(ds, text_col, target_filter_col,
                          target_filter_value)
    llr_ref = ray.put(llr_table(tgt, raw))

    def score(batch: pa.Table) -> pa.Table:
        llr = ray.get(llr_ref)
        n_docs = batch.num_rows
        buckets, occ_doc, dl = _batch_buckets(batch[text_col])
        # n_feats per doc = unigrams + bigrams = dl + max(dl-1, 0)
        n_feats = dl + np.maximum(dl - 1, 0)
        scores = np.zeros(n_docs, dtype=np.int64)
        if len(buckets):
            # exact int64 segment sums: sort occurrences by doc (the
            # unigram/bigram concat broke row-major order), reduceat
            order = np.argsort(occ_doc, kind="stable")
            od = occ_doc[order]
            v = llr[buckets[order]]
            starts = np.flatnonzero(np.r_[True, od[1:] != od[:-1]])
            scores[od[starts]] = np.add.reduceat(v, starts)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_feats": pa.array(n_feats, pa.int64()),
                "dsir_score": pa.array(scores, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def sql_dsir_score(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    target_filter_col: str = "lang", target_filter_value: str = "en",
) -> str:
    """DuckDB recompute of dsir_score — identical feature hash, identical
    llr expression tree (floor(1e6*(ln-ln-ln+ln)+0.5)), integer dot."""
    toks = f"string_split_regex(trim(coalesce({text_col}, '')), '\\s+')"
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 CASE WHEN trim(coalesce({text_col}, '')) = ''
                      THEN [] ELSE {toks} END AS ws,
                 {target_filter_col} = '{target_filter_value}' AS is_tgt
          FROM {table}
        ),
        grams AS (
          SELECT {id_col}, is_tgt, ws[i] AS gram
          FROM toks, UNNEST(generate_series(1, len(ws))) AS t(i)
          UNION ALL
          SELECT {id_col}, is_tgt, ws[i] || ' ' || ws[i+1] AS gram
          FROM toks,
               UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
        ),
        feats AS (
          SELECT {id_col}, is_tgt,
                 CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                   % {N_BUCKETS} AS bucket
          FROM grams
        ),
        buckets AS (
          SELECT unnest(generate_series(0, {N_BUCKETS} - 1)) AS bucket
        ),
        model AS (
          SELECT b.bucket,
                 CAST(coalesce(sum(CASE WHEN f.is_tgt THEN 1 END), 0)
                      AS BIGINT) AS t_c,
                 CAST(count(f.bucket) AS BIGINT) AS r_c
          FROM buckets b LEFT JOIN feats f ON f.bucket = b.bucket
          GROUP BY b.bucket
        ),
        totals AS (
          SELECT CAST(sum(t_c) AS BIGINT) AS t_total,
                 CAST(sum(r_c) AS BIGINT) AS r_total
          FROM model
        ),
        llr AS (
          SELECT bucket,
                 CAST(floor({LLR_SCALE} * (
                       ln(CAST(t_c + 1 AS DOUBLE))
                     - ln(CAST(t_total + {N_BUCKETS} AS DOUBLE))
                     - ln(CAST(r_c + 1 AS DOUBLE))
                     + ln(CAST(r_total + {N_BUCKETS} AS DOUBLE))
                   ) + 0.5) AS BIGINT) AS w
          FROM model, totals
        )
        SELECT d.{id_col},
               CAST(coalesce(count(f.bucket), 0) AS BIGINT) AS n_feats,
               CAST(coalesce(sum(l.w), 0) AS BIGINT) AS dsir_score
        FROM {table} d
        LEFT JOIN feats f ON f.{id_col} = d.{id_col}
        LEFT JOIN llr l ON l.bucket = f.bucket
        GROUP BY d.{id_col}
    """
