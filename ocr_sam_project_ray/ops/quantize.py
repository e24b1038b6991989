"""Int8 embedding quantization + integer-dot ANN — the memory-bound
retrieval path. At 100 TB an embedding store is the largest artifact
after the text itself (a 64-dim float32 corpus at 1e12 docs is ~256 TB);
symmetric max-abs int8 quantization (the standard scalar scheme, cf.
Jacob et al. 2018 §2.1 and faiss's SQ8) cuts it 4x and turns the scoring
matmul into small-integer arithmetic.

Exact-integer contract (the repo's oracle discipline): with the corpus
max-abs scale s, q = round(x * 127.0 / s) computed in float64 with
half-away-from-zero rounding — bit-identical to DuckDB's
``round(CAST(x AS DOUBLE) * 127.0 / s)`` because every upstream value is
float32-exact in float64 and the two arithmetic ops are IEEE doubles in
the same order on both sides. |q| ≤ 127 by construction (|x| ≤ s), so
no clamp is needed and a 64-dim dot product is ≤ 127²·64 ≈ 2^20 — int64
scores are exact and SQL-recomputable via list_dot_product on the
quantized (integer-valued) lists.

Scale shape: fitting the scale is one column-pruned pass with a
one-row-per-BLOCK partial max (batch_size=None — the block-kernel rule,
see engine memory) folded on the driver; quantization and scoring are
single vectorized map_batches passes with the tiny query matrix
broadcast once. Two corpus passes total (global scale needs one) — at
100 TB the scale would be fitted once and persisted beside the store.

Beyond-reference training-data op (the reference has no embedding
surface); companion to ops/embed.py's float paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .embed import _batch_matrix, _merge_topk, topk_tied_idx

Q_LEVELS = 127.0


def np_round_half_away(x: np.ndarray) -> np.ndarray:
    """Half away from zero on both signs — EXACT C round()/DuckDB
    round() semantics. The classic floor(x+0.5) trick is wrong at
    x = nextafter(0.5, 0): x+0.5 rounds UP to exactly 1.0 in float64
    before the floor (review-confirmed DuckDB divergence). Here
    np.rint handles every non-half value exactly (ties can only occur
    at representable .5 fractions) and the half mask sends exact
    halves away from zero."""
    x = np.asarray(x, dtype=np.float64)
    frac = x - np.trunc(x)
    return np.where(
        np.abs(frac) == 0.5, np.trunc(x) + np.sign(x), np.rint(x)
    )


def fit_maxabs_scale(ds: Dataset, emb_col: str = "embedding") -> float:
    """Corpus max|x| — the symmetric quantization scale. One pruned
    pass, one partial row per block, bounded driver fold."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"mx": pa.array([], pa.float64())})
        m = _batch_matrix(batch, emb_col)
        return pa.table(
            {"mx": pa.array([float(np.abs(m).max())], pa.float64())}
        )

    mx = 0.0
    for blk in (
        ds.select_columns([emb_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow")
    ):
        for v in blk["mx"].to_pylist():
            mx = max(mx, v)
    if mx == 0.0:
        raise ValueError(
            "all-zero embedding corpus: max-abs scale is 0 and symmetric "
            "quantization is undefined"
        )
    return mx


def _quantize_matrix(m: np.ndarray, scale: float) -> np.ndarray:
    """float64 matrix -> integer-valued float64 in [-127, 127]."""
    return np_round_half_away(m * Q_LEVELS / scale)


def quantize_embeddings(
    ds: Dataset,
    scale: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """(id, qemb: list<int8>) — the 4x-smaller store."""

    def q(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {id_col: batch[id_col],
                 "qemb": pa.array([], pa.list_(pa.int8()))}
            )
        m = _batch_matrix(batch, emb_col)
        qf = _quantize_matrix(m, scale)
        # |q| ≤ 127 only holds when ``scale`` covers the data; a stale
        # persisted scale + a new out-of-range vector would WRAP in the
        # int8 cast (2.0 under scale 1.0 -> 254 -> -2) and silently
        # corrupt the store — refuse loudly instead
        if qf.size and np.abs(qf).max() > 127:
            raise ValueError(
                f"embedding magnitude exceeds the quantization scale "
                f"{scale!r} (max |q| = {np.abs(qf).max():.0f} > 127): "
                "refit the scale over the full corpus before building "
                "the store"
            )
        qm = qf.astype(np.int8)
        dim = qm.shape[1]
        offsets = pa.array(
            np.arange(0, (n + 1) * dim, dim, dtype=np.int32), pa.int32()
        )
        la = pa.ListArray.from_arrays(
            offsets, pa.array(qm.reshape(-1), pa.int8())
        )
        return pa.table({id_col: batch[id_col], "qemb": la})

    return ds.select_columns([id_col, emb_col]).map_batches(
        q, batch_format="pyarrow"
    )


def quantize_stats(
    ds: Dataset,
    scale: float | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Per-vector quantization audit under the corpus scale:
    (id, q_min, q_max, q_sum, q_l1) — all exact int64, the columns a
    calibration report reads (saturation, bias, mass)."""
    if scale is None:
        scale = fit_maxabs_scale(ds, emb_col)

    def stats(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            empty = pa.array([], pa.int64())
            return pa.table(
                {id_col: batch[id_col], "q_min": empty, "q_max": empty,
                 "q_sum": empty, "q_l1": empty}
            )
        qm = _quantize_matrix(_batch_matrix(batch, emb_col), scale).astype(
            np.int64
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "q_min": pa.array(qm.min(axis=1), pa.int64()),
                "q_max": pa.array(qm.max(axis=1), pa.int64()),
                "q_sum": pa.array(qm.sum(axis=1), pa.int64()),
                "q_l1": pa.array(np.abs(qm).sum(axis=1), pa.int64()),
            }
        )

    return ds.select_columns([id_col, emb_col]).map_batches(
        stats, batch_format="pyarrow"
    )


def knn_quantized(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    scale: float | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    pre_quantized: bool = False,
) -> "pa.Table":
    """Top-k by exact int64 dot product over int8-quantized vectors
    (both sides quantized under the one corpus scale). Deterministic
    ties: score DESC, id ASC. Per-batch local top-k against the
    broadcast query matrix, then a query-bounded distributed merge
    (the ops/embed.knn_cosine shape).

    ``pre_quantized=True`` is the deployment shape at scale: ``ds`` is
    the persisted int8 store from quantize_embeddings (``emb_col``
    holds the int8 lists), so scoring reads 4x fewer bytes and skips
    the per-batch rounding; ``scale`` (persisted beside the store) is
    then only used to quantize the incoming queries. Results are
    identical to quantizing on the fly — pinned by test_quantize."""
    if scale is None:
        if pre_quantized:
            raise ValueError(
                "a pre-quantized store needs its persisted scale to "
                "quantize the queries consistently"
            )
        scale = fit_maxabs_scale(ds, emb_col)
    # keep the integer-VALUED matrices in float64: every partial sum of
    # a quantized dot product is ≤ 127²·dim ≪ 2^53, so BLAS float64
    # matmul is EXACT here — and ~50x the throughput of numpy's int64
    # matmul, which has no BLAS path (guarded loudly below)
    qq = _quantize_matrix(np.asarray(queries, dtype=np.float64), scale)
    if qq.size and 127 * 127 * qq.shape[1] >= 2 ** 53:
        raise ValueError(
            "quantized dot products would exceed the float64 exact-"
            f"integer range at dim={qq.shape[1]}; score in int64 instead"
        )
    q_ref = ray.put(qq)

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"qid": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.int64())}
            )
        qm = ray.get(q_ref)
        if pre_quantized:
            tm = _batch_matrix(batch, emb_col)  # int8 lists -> float64
        else:
            tm = _quantize_matrix(_batch_matrix(batch, emb_col), scale)
        # exact: integer-valued float64 operands, sums < 2^53
        scores = (qm @ tm.T).astype(np.int64)  # (Q, B)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        kk = min(k, scores.shape[1])
        out_q, out_i, out_s = [], [], []
        for qi in range(scores.shape[0]):
            # integer scores TIE often — tie-deterministic local cut
            # (embed.topk_tied_idx: score DESC, id ASC, matching the
            # merge and the SQL row_number)
            part = topk_tied_idx(scores[qi], ids, kk)
            out_q.extend([query_ids[qi]] * len(part))
            out_i.extend(ids[part].tolist())
            out_s.extend(scores[qi][part].tolist())
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_i, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
            }
        )

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(partials, k, score_col="score", round6=False)


# ---------------------------------------------------------------- SQL

_SCALE_CTE = """s AS (
          SELECT CAST(max(abs(e)) AS DOUBLE) AS mx
          FROM {table}, unnest(CAST({emb_col} AS DOUBLE[])) AS u(e)
        )"""

_QE = ("list_transform(CAST({emb_col} AS DOUBLE[]), "
       "x -> round(x * 127.0 / s.mx))")


def sql_quantize_stats(
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    scale = _SCALE_CTE.format(table=table, emb_col=emb_col)
    qe = _QE.format(emb_col=emb_col)
    return f"""
        WITH {scale},
        q AS (SELECT {id_col}, {qe} AS qe FROM {table}, s)
        SELECT {id_col},
               CAST(list_min(qe) AS BIGINT) AS q_min,
               CAST(list_max(qe) AS BIGINT) AS q_max,
               CAST(list_sum(qe) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(qe, x -> abs(x)))
                    AS BIGINT) AS q_l1
        FROM q ORDER BY {id_col}
    """


def sql_knn_quantized(
    n_queries: int = 20,
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    scale = _SCALE_CTE.format(table=table, emb_col=emb_col)
    qe = _QE.format(emb_col=emb_col)
    return f"""
        WITH {scale},
        q AS (SELECT {id_col} AS qid, {qe} AS qe
              FROM {table}, s WHERE {id_col} < {n_queries}),
        t AS (SELECT {id_col}, {qe} AS qe FROM {table}, s)
        SELECT qid, {id_col},
               CAST(list_dot_product(q.qe, t.qe) AS BIGINT) AS score
        FROM q, t
        QUALIFY row_number() OVER (
          PARTITION BY qid
          ORDER BY list_dot_product(q.qe, t.qe) DESC, {id_col}
        ) <= {k}
        ORDER BY qid, score DESC, {id_col}
    """
