"""Within-document repetition signals — the Gopher repetition filters
(Rae et al. 2021, "Scaling Language Models", §A1.1): documents dominated
by a few repeated n-grams are boilerplate/spam and get filtered before
training.  Complements ops/quality.py (length/stopword/symbol rules),
which has no repetition axis.

Integer contract (exactly what the DuckDB oracle recomputes — no floats,
no argmax tie ambiguity):

- ``parts = text.split(' ')`` — single-space split, matching DuckDB
  ``string_split(text, ' ')`` including the ``'' → ['']`` edge;
- ``n_words  = len(parts)``;
- ``top1_count = max unigram count``;
- per n ∈ {2, 3}: over the multiset of word n-grams (joined with one
  space):
  - ``top{n}_count = max n-gram count``  (0 when the doc has no n-grams),
  - ``dup{n}_count = Σ (count - 1)``     (occurrences beyond first),
  - ``dup{n}_chars = Σ count · len(gram)``  over grams with count ≥ 2
    (character mass inside repeated n-grams — Gopher's "fraction of
    characters in duplicate n-grams" numerator),
  - ``dup{n}_ppm = dup{n}_count · 10^6 // (#n-grams)`` (0 when none) —
    integer parts-per-million so engine and SQL agree bit-for-bit.

Scale notes: stateless ``map_batches`` over the pruned text column — zero
shuffle; the kernel is per-document by nature (each doc owns its Counter)
but allocation-light: one split + dict counting per doc, no regex.  At
10^12 docs this stage pipelines with the reader exactly like
ops/textstats.py.

The reference has no repetition analysis (SURVEY §2.6); part of the
engine's beyond-reference training-data surface.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ray.data import Dataset

NGRAM_SIZES = (2, 3)
_PPM = 1_000_000


def repetition_row(text: str | None) -> dict:
    parts = (text or "").split(" ")
    out = {
        "n_words": len(parts),
        "top1_count": max(Counter(parts).values()),
    }
    for n in NGRAM_SIZES:
        grams = Counter(
            " ".join(parts[i:i + n]) for i in range(len(parts) - n + 1)
        )
        n_grams = max(len(parts) - n + 1, 0)
        dup = sum(c - 1 for c in grams.values())
        out[f"top{n}_count"] = max(grams.values()) if grams else 0
        out[f"dup{n}_count"] = dup
        out[f"dup{n}_chars"] = sum(
            c * len(g) for g, c in grams.items() if c >= 2)
        out[f"dup{n}_ppm"] = (dup * _PPM) // n_grams if n_grams else 0
    return out


def repetition_batch(batch: pa.Table, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    rows = [repetition_row(t) for t in batch[text_col].to_pylist()]
    cols = {id_col: batch[id_col]}
    for k in rows[0] if rows else []:
        cols[k] = pa.array([r[k] for r in rows], pa.int64())
    return pa.table(cols)


def score_repetition(ds: Dataset, *, id_col: str = "doc_id",
                     text_col: str = "text") -> Dataset:
    """Dataset → Dataset(id, n_words, top1_count, top/dup/ppm per n)."""
    return ds.map_batches(
        lambda b: repetition_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )


def sql_repetition(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """DuckDB recompute: positioned unnest → self-joins at +1/+2 offsets
    → per-gram counts → the same integer aggregates.  All sums cast back
    to BIGINT (DuckDB sum(BIGINT) → HUGEINT)."""
    gram_ctes, gram_cols = [], []
    for n in NGRAM_SIZES:
        joins = "\n              ".join(
            f"JOIN w w{j} ON w{j}.{id_col} = w1.{id_col} "
            f"AND w{j}.i = w1.i + {j - 1}"
            for j in range(2, n + 1)
        )
        gram = " || ' ' || ".join(f"w{j}.w" for j in range(1, n + 1))
        gram_ctes.append(f"""
            g{n} AS (
              SELECT {id_col}, g, count(*) AS cnt FROM (
                SELECT w1.{id_col} AS {id_col}, {gram} AS g
                FROM w w1
              {joins}
              ) GROUP BY {id_col}, g
            ),
            a{n} AS (
              SELECT {id_col},
                     CAST(max(cnt) AS BIGINT) AS top{n}_count,
                     CAST(sum(cnt - 1) AS BIGINT) AS dup{n}_count,
                     CAST(sum(CASE WHEN cnt >= 2 THEN cnt * len(g)
                                   ELSE 0 END) AS BIGINT) AS dup{n}_chars
              FROM g{n} GROUP BY {id_col}
            )""")
        gram_cols.append(f"""
                   CAST(coalesce(a{n}.top{n}_count, 0) AS BIGINT)
                     AS top{n}_count,
                   CAST(coalesce(a{n}.dup{n}_count, 0) AS BIGINT)
                     AS dup{n}_count,
                   CAST(coalesce(a{n}.dup{n}_chars, 0) AS BIGINT)
                     AS dup{n}_chars,
                   CASE WHEN p.nw >= {n}
                        THEN CAST(coalesce(a{n}.dup{n}_count, 0)
                                  * {_PPM} AS BIGINT)
                             // (p.nw - {n} + 1)
                        ELSE 0 END AS dup{n}_ppm""")
    joins_final = "\n            ".join(
        f"LEFT JOIN a{n} ON a{n}.{id_col} = p.{id_col}"
        for n in NGRAM_SIZES)
    return f"""
        WITH p AS (
          SELECT {id_col},
                 string_split(coalesce({text_col}, ''), ' ') AS parts,
                 len(string_split(coalesce({text_col}, ''), ' ')) AS nw
          FROM {table}
        ),
        w AS (
          SELECT {id_col}, unnest(parts) AS w,
                 unnest(generate_series(1, len(parts))) AS i
          FROM p
        ),
        u AS (
          SELECT {id_col}, CAST(max(cnt) AS BIGINT) AS top1_count FROM (
            SELECT {id_col}, w, count(*) AS cnt FROM w GROUP BY {id_col}, w
          ) GROUP BY {id_col}
        ),{",".join(gram_ctes)}
        SELECT p.{id_col},
               CAST(p.nw AS BIGINT) AS n_words,
               u.top1_count,{",".join(gram_cols)}
        FROM p
        JOIN u ON u.{id_col} = p.{id_col}
        {joins_final}
    """
