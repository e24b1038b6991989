"""PMI collocation mining — corpus-wide top-k adjacent-bigram
collocations (Church & Hanks 1990, "Word Association Norms, Mutual
Information, and Lexicography"): the corpus-audit op that surfaces
multi-word expressions, boilerplate phrases and tokenizer-merge
candidates.

Contract (what the DuckDB oracle recomputes exactly):
- token model = the engine-wide contract (ops/textstats.tokenize);
  bigram = two adjacent tokens of one document, counted with
  multiplicity (the same positional model as ops/repetition);
- c_xy = corpus count of bigram (x y); c_x, c_y = corpus UNIGRAM counts;
- score(x, y) = c_xy / (c_x * c_y) computed as ONE IEEE-754 division of
  the exact integer c_xy by the exact integer c_x*c_y (< 2^53 by
  contract) — a single correctly-rounded operation, so numpy and DuckDB
  produce bit-identical doubles. This is the LINEAR-PMI rank contract
  (same trick as ops/tfidf's linear idf): for a fixed corpus,
  PMI = ln(c_xy·N / (c_x·c_y)) = ln(score) + ln(N), a monotone transform
  — identical ranking, provable cross-engine parity (ln's last ulp is
  libm-dependent; one division is not);
- keep bigrams with c_xy >= min_count (collocation practice: rare pairs
  have degenerate PMI); top-k by (score DESC, gram ASC), rank 1-based.

Scale shape: ONE corpus read, ONE tokenization pass and ONE key shuffle
build BOTH count tables (each batch emits prefix-keyed unigram 'u<tok>'
and bigram 'b<x> <y>' partial counts into a single groupby). At sandbox
scale this is wall-time-equivalent to the naive two-pass (~6.6 s at
sf0.1/32cpu — the combiner, not the read, dominates there), but it
halves input IO and tokenization, which is what matters when the read
is 100 TB of parquet. The unigram table is
vocabulary-bounded and broadcast once (``ray.put``, loud error past
``BROADCAST_MAX_TOKENS``); scoring + lossless per-block top-k pruning
happen inside map_batches over the bigram table, and only k rows per
block reach the final tiny sort-limit (the ops/heavy.top_tokens merge
shape).

The reference has no corpus statistics (one document per Lambda);
beyond-reference training-data op.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..context import configure_data_context
from .textstats import tokenize

DEFAULT_K = 50
MIN_COUNT = 5
# same bound family as tfidf.BROADCAST_MAX_TOKENS: ~50M tokens ≈ a few GB
# driver dict — above it, fail loudly instead of OOMing silently. (The
# extension path is tfidf's tag-union co-partitioned apply; collocation
# mining over a >50M-type vocabulary should pre-prune with min_count
# pushed into the unigram groupby first.)
BROADCAST_MAX_TOKENS = 50_000_000


def _fused_counts(
    ds: Dataset, text_col: str, num_partitions: int,
) -> tuple[Dataset, dict[str, int]]:
    """ONE tokenization pass and ONE key shuffle for both statistics:
    each batch emits its unigram counts under key 'u<token>' and its
    bigram counts under 'b<x> <y>' (tokens never start with a reserved
    marker because the keys are PREFIXED, not the tokens), one groupby
    sums them, and the result splits back into the bigram Dataset and
    the (bounded, broadcastable) unigram dict."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch[text_col].to_pylist():
            toks = tokenize(text)
            counts.update("u" + t for t in toks)
            counts.update(
                f"b{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
            )
        keys = list(counts.keys())
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "c": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )

    def bigram_rows(batch: pa.Table) -> pa.Table:
        mask = pc.starts_with(batch["key"], "b")
        kept = batch.filter(mask)
        return pa.table(
            {
                "gram": pc.utf8_slice_codeunits(kept["key"], 1),
                "c_xy": kept["c"],
            }
        )

    bigrams = folded.map_batches(bigram_rows, batch_format="pyarrow")

    uni: dict[str, int] = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        mask = pc.starts_with(b["key"], "u")
        kept = b.filter(mask)
        uni.update(
            zip(pc.utf8_slice_codeunits(kept["key"], 1).to_pylist(),
                kept["c"].to_pylist())
        )
        if len(uni) > BROADCAST_MAX_TOKENS:
            raise ValueError(
                f"unigram vocabulary exceeds the broadcast bound "
                f"({BROADCAST_MAX_TOKENS}); see ops/pmi.py docstring for "
                f"the co-partitioned extension path"
            )
    return bigrams, uni


def pmi_topk(
    ds: Dataset, k: int = DEFAULT_K, text_col: str = "text",
    min_count: int = MIN_COUNT, num_partitions: int = 8,
) -> pa.Table:
    """Top-k collocations -> driver Arrow table (exactly <= k rows):
    (rank, gram, c_xy, c_x, c_y, score)."""
    configure_data_context()
    bigrams, uni = _fused_counts(ds, text_col, num_partitions)
    uni_ref = ray.put(uni)

    def score_and_prune(batch: pa.Table) -> pa.Table:
        u = ray.get(uni_ref)
        grams = batch["gram"].to_pylist()
        c_xy = np.asarray(batch["c_xy"].to_pylist(), dtype=np.int64)
        keep = c_xy >= min_count
        rows = []
        for g, cxy, ok in zip(grams, c_xy, keep):
            if not ok:
                continue
            x, y = g.split(" ", 1)
            cx, cy = u[x], u[y]
            # float()/float(): mirror the oracle's CAST-then-divide so
            # semantics stay identical even past the 2^53 contract bound
            rows.append((g, int(cxy), cx, cy,
                         float(int(cxy)) / float(cx * cy)))
        rows.sort(key=lambda r: (-r[4], r[0]))
        rows = rows[:k]
        return pa.table(
            {
                "gram": pa.array([r[0] for r in rows], pa.string()),
                "c_xy": pa.array([r[1] for r in rows], pa.int64()),
                "c_x": pa.array([r[2] for r in rows], pa.int64()),
                "c_y": pa.array([r[3] for r in rows], pa.int64()),
                "score": pa.array([r[4] for r in rows], pa.float64()),
            }
        )

    pruned = bigrams.map_batches(score_and_prune, batch_format="pyarrow")
    top = (
        pruned.sort(["score", "gram"], descending=[True, False])
        .limit(k).to_pandas()
    )
    out = pa.Table.from_pandas(top, preserve_index=False)
    rank = pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
    return pa.table(
        {
            "rank": rank,
            "gram": out["gram"],
            "c_xy": out["c_xy"].cast(pa.int64()),
            "c_x": out["c_x"].cast(pa.int64()),
            "c_y": out["c_y"].cast(pa.int64()),
            "score": out["score"].cast(pa.float64()),
        }
    )


def sql_pmi_topk(table: str = "documents", text_col: str = "text",
                 k: int = DEFAULT_K, min_count: int = MIN_COUNT) -> str:
    """DuckDB recompute of pmi_topk (identical single-division score)."""
    toks = f"string_split_regex(trim(coalesce({text_col}, '')), '\\s+')"
    return f"""
        WITH t AS (
          SELECT {toks} AS ws FROM {table}
          WHERE trim(coalesce({text_col}, '')) <> ''
        ),
        uni AS (
          SELECT token, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(ws) AS token FROM t) GROUP BY token
        ),
        big AS (
          SELECT gram, CAST(count(*) AS BIGINT) AS c_xy
          FROM (
            SELECT ws[i] || ' ' || ws[i+1] AS gram
            FROM t,
                 UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS s(i)
          ) GROUP BY gram HAVING count(*) >= {min_count}
        ),
        scored AS (
          SELECT b.gram, b.c_xy, ux.c AS c_x, uy.c AS c_y,
                 CAST(b.c_xy AS DOUBLE) / CAST(ux.c * uy.c AS DOUBLE)
                   AS score
          FROM big b
          JOIN uni ux ON ux.token = string_split(b.gram, ' ')[1]
          JOIN uni uy ON uy.token = string_split(b.gram, ' ')[2]
        )
        SELECT CAST(row_number() OVER (ORDER BY score DESC, gram)
                 AS BIGINT) AS rank,
               gram, c_xy, c_x, c_y, score
        FROM scored
        ORDER BY score DESC, gram
        LIMIT {k}
    """
