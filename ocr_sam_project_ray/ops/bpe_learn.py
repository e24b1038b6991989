"""Distributed BPE merge learning — tokenizer training over the corpus
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units": iteratively merge the most frequent adjacent
symbol pair). The op a training-data pipeline runs to FIT the tokenizer
on the corpus it just curated; ops/textstats.bpe_token_count is the
downstream consumer shape (counting with a fixed tokenizer).

Scale shape — the published algorithm's key property, kept intact:
1. ONE corpus pass builds the word-frequency table (reuses the
   ops/corpus_stats.token_df combiner -> single token-key shuffle); the
   corpus is never touched again. The vocab table is bounded by DISTINCT
   words, not corpus size.
2. Every merge round runs over the materialized vocab Dataset:
   - pair-count partials: per batch, a Counter of adjacent symbol pairs
     weighted by word frequency -> one bounded Arrow row per batch
     folded on the driver (the kmeans/HLL fold pattern; distinct
     adjacent pairs are vocabulary-bounded);
   - argmax pair with a DETERMINISTIC tie-break (count DESC, then pair
     lexicographic ASC — Sennrich leaves ties arbitrary; we pin them so
     distributed runs are reproducible and partition-invariant);
   - merge apply: map_batches rewrites each word's symbol list, merging
     LEFTMOST NON-OVERLAPPING occurrences (the reference semantics);
     materialize() per round, as in ops/kmeans, so round N+1 does not
     re-execute round N's lineage.
So n_merges rounds cost n_merges x 2 passes over the WORD TABLE — at
100 TB the corpus pass dominates once and the rounds are cheap.

Oracle split (repo convention for iterative ops, cf. kmeans/semdedup):
- ``bpe_pair_counts`` — round-1 adjacent CHARACTER pair counts over the
  corpus — has a full DuckDB recompute (``sql_bpe_pair_counts``);
- the merge LIST itself is iterative list-rewriting (not reasonably
  SQL-expressible); ``learn_bpe_merges`` is certified in pytest against
  a from-first-principles reference implementation plus partition
  invariance (test_bpe_learn).

The reference repo has no tokenizer surface at all; beyond-reference
training-data op.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .corpus_stats import token_df

DEFAULT_MERGES = 20
MIN_PAIR_COUNT = 2


def merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge leftmost non-overlapping occurrences of ``pair`` in one
    word's symbol sequence (reference BPE semantics)."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def pair_counts_of(syms: list[str], freq: int, into: Counter) -> None:
    for x, y in zip(syms, syms[1:]):
        into[(x, y)] += freq


def _word_table(ds: Dataset, text_col: str, num_partitions: int) -> Dataset:
    """(word, freq) — distinct whitespace tokens with occurrence counts."""
    vocab = token_df(ds, text_col=text_col, num_partitions=num_partitions)
    return vocab.map_batches(
        lambda b: pa.table({"word": b["token"], "freq": b["tf"]}),
        batch_format="pyarrow",
    )


def learn_bpe_merges(
    ds: Dataset, n_merges: int = DEFAULT_MERGES, text_col: str = "text",
    num_partitions: int = 8, min_pair_count: int = MIN_PAIR_COUNT,
) -> list[tuple[str, str]]:
    """Fit ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list. Stops early when the best pair drops under
    ``min_pair_count`` (no degenerate single-occurrence merges)."""
    configure_data_context()

    def to_syms(batch: pa.Table) -> pa.Table:
        syms = [list(w) for w in batch["word"].to_pylist()]
        return pa.table(
            {
                "syms": pa.array(syms, pa.list_(pa.string())),
                "freq": batch["freq"],
            }
        )

    state = (
        _word_table(ds, text_col, num_partitions)
        .map_batches(to_syms, batch_format="pyarrow")
        .materialize()
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        freqs = batch["freq"].to_pylist()
        for syms, f in zip(batch["syms"].to_pylist(), freqs):
            pair_counts_of(syms, f, counts)
        pairs = list(counts.keys())
        return pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.string()),
                "b": pa.array([p[1] for p in pairs], pa.string()),
                "c": pa.array([counts[p] for p in pairs], pa.int64()),
            }
        )

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        folded: Counter = Counter()
        for blk in state.map_batches(
            count_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for a, b, c in zip(blk["a"].to_pylist(), blk["b"].to_pylist(),
                               blk["c"].to_pylist()):
                folded[(a, b)] += c
        if not folded:
            break
        best = min(folded.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        pair_ref = ray.put(pair)

        def apply(batch: pa.Table, _ref=pair_ref) -> pa.Table:
            p = ray.get(_ref)
            syms = [merge_word(s, p) for s in batch["syms"].to_pylist()]
            return pa.table(
                {
                    "syms": pa.array(syms, pa.list_(pa.string())),
                    "freq": batch["freq"],
                }
            )

        state = state.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def bpe_pair_counts(
    ds: Dataset, text_col: str = "text", num_partitions: int = 8,
) -> Dataset:
    """Round-1 adjacent character-pair counts over the corpus (weighted
    by word occurrences) -> Dataset(pair:string 'a b', c:int64). This is
    exactly the statistic the first merge argmaxes over; the DuckDB twin
    recomputes it from the raw text."""
    configure_data_context()

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        freqs = batch["freq"].to_pylist()
        for w, f in zip(batch["word"].to_pylist(), freqs):
            for x, y in zip(w, w[1:]):
                counts[(x, y)] += f
        pairs = list(counts.keys())
        return pa.table(
            {
                "pair": pa.array([f"{a} {b}" for a, b in pairs],
                                 pa.string()),
                "c": pa.array([counts[p] for p in pairs], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        _word_table(ds, text_col, num_partitions)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pair", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="c"))
    )


def sql_bpe_pair_counts(table: str = "documents",
                        text_col: str = "text") -> str:
    """DuckDB recompute of bpe_pair_counts from the raw text."""
    toks = f"string_split_regex(trim(coalesce({text_col}, '')), '\\s+')"
    return f"""
        WITH words AS (
          SELECT unnest({toks}) AS w
          FROM {table} WHERE trim(coalesce({text_col}, '')) <> ''
        ),
        pairs AS (
          SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair
          FROM words,
               UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
        )
        SELECT pair, CAST(count(*) AS BIGINT) AS c
        FROM pairs GROUP BY pair ORDER BY pair
    """
