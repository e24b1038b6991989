"""Gopher/C4-style document quality rules — the standard pre-training
corpus hygiene pass (Rae et al. 2021 "Scaling Language Models" appendix A
/ Raffel et al. 2020 C4): repetition, shape and symbol heuristics that
drop machine-generated or boilerplate junk before training.

Every metric is an INTEGER counter and every rule an integer comparison,
so the DuckDB oracle (``sql_quality_gopher``) recomputes the whole surface
exactly — no float-ratio parity traps (the engine-wide rule from
relational._cents). The rule thresholds are the published Gopher values
expressed in integer math, e.g. "mean word length in [3, 10]" becomes
``3*n_words <= sum_word_len <= 10*n_words``.

Scale shape: one stateless vectorized ``map_batches`` pass — no shuffle,
no state, no driver work; the per-doc kernel is C-speed str ops + one
``Counter`` over the token list. Filtering (``filter_quality``) happens in
the same batch that scored it, so rejected payloads never travel.

Metric contract (all on ``coalesce(text, '')``):
- lines  = text.split("\\n")           (so even "" has 1 line)
- words  = textstats.tokenize(text)    (strip, split \\s+, "" -> [])
- alpha word  = word containing >= 1 ASCII letter
- bullet line = line matching ^[ \\t]*[-*•]   (explicit [ \\t], NOT \\s —
  Python re and DuckDB RE2 disagree on unicode whitespace classes)
- ellipsis line = line matching (\\.\\.\\.|…)[ \\t]*$
- '...' symbol count = non-overlapping count (str.count == replace-based
  SQL count, both consume left-to-right)
- max_word_count / stop hits are over LOWERCASED words; stop set =
  textstats.STOPWORDS["en"] (10 words, the C4 "contains stopwords" rule)

Rules (gopher_pass = all of):
  R1  50 <= n_words <= 100000                (word-count bounds)
  R2  3*n_words <= sum_word_len <= 10*n_words  (mean word length 3..10)
  R3  10*n_alpha_words >= 8*n_words          (>= 80% words alphabetic)
  R4  10*n_bullet_lines <= 9*n_lines         (<= 90% bullet lines)
  R5  10*n_ellipsis_lines <= 3*n_lines       (<= 30% ellipsis lines)
  R6  10*n_hash_sym <= n_words               (# -to-word ratio <= 0.1)
  R7  10*n_ellipsis_sym <= n_words           ('...'-to-word ratio <= 0.1)
  R8  10*(n_lines - n_distinct_lines) <= 3*n_lines  (<= 30% dup lines)
  R9  10*max_word_count <= 2*n_words         (top word covers <= 20%)
  R10 n_stop_hits >= 2                       (C4 stopword evidence)
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

from .textstats import STOPWORDS, tokenize

_ALPHA = re.compile(r"[A-Za-z]")
_BULLET = re.compile(r"^[ \t]*[-*\u2022]")
_ELLIPSIS_END = re.compile(r"(\.\.\.|\u2026)[ \t]*$")

_STOP_EN = frozenset(STOPWORDS["en"])

QUALITY_COLUMNS = (
    "n_lines",
    "n_distinct_lines",
    "n_words",
    "sum_word_len",
    "n_alpha_words",
    "n_bullet_lines",
    "n_ellipsis_lines",
    "n_hash_sym",
    "n_ellipsis_sym",
    "max_word_count",
    "n_stop_hits",
)


def quality_row(text: str | None) -> dict:
    t = text or ""
    lines = t.split("\n")
    words = tokenize(t)
    lwords = [w.lower() for w in words]
    counts = Counter(lwords)
    row = {
        "n_lines": len(lines),
        "n_distinct_lines": len(set(lines)),
        "n_words": len(words),
        "sum_word_len": sum(len(w) for w in words),
        "n_alpha_words": sum(1 for w in words if _ALPHA.search(w)),
        "n_bullet_lines": sum(1 for x in lines if _BULLET.match(x)),
        "n_ellipsis_lines": sum(1 for x in lines if _ELLIPSIS_END.search(x)),
        "n_hash_sym": t.count("#"),
        "n_ellipsis_sym": t.count("..."),
        "max_word_count": max(counts.values()) if counts else 0,
        "n_stop_hits": sum(1 for w in lwords if w in _STOP_EN),
    }
    row["gopher_pass"] = _passes(row)
    return row


def _passes(r: dict) -> bool:
    nw, nl = r["n_words"], r["n_lines"]
    return (
        50 <= nw <= 100000
        and 3 * nw <= r["sum_word_len"] <= 10 * nw
        and 10 * r["n_alpha_words"] >= 8 * nw
        and 10 * r["n_bullet_lines"] <= 9 * nl
        and 10 * r["n_ellipsis_lines"] <= 3 * nl
        and 10 * r["n_hash_sym"] <= nw
        and 10 * r["n_ellipsis_sym"] <= nw
        and 10 * (nl - r["n_distinct_lines"]) <= 3 * nl
        and 10 * r["max_word_count"] <= 2 * nw
        and r["n_stop_hits"] >= 2
    )


def quality_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    rows = [quality_row(t) for t in batch.column(text_col).to_pylist()]
    cols: dict = {id_col: batch.column(id_col)}
    for name in QUALITY_COLUMNS:
        cols[name] = pa.array([r[name] for r in rows], pa.int64())
    cols["gopher_pass"] = pa.array([r["gopher_pass"] for r in rows], pa.bool_())
    return pa.table(cols)


def score_quality(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset → Dataset(id, 11 integer metrics, gopher_pass)."""
    return ds.map_batches(
        lambda b: quality_batch(b, id_col, text_col), batch_format="pyarrow"
    )


def filter_quality(ds, *, text_col: str = "text"):
    """Dataset → Dataset of passing docs (all columns), filtered inside the
    scoring batch — rejected payloads never leave the task."""

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [_passes(quality_row(t)) for t in batch.column(text_col).to_pylist()]
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# oracle rendering (DuckDB). Same integer contract, recomputed from scratch.
# ---------------------------------------------------------------------------

def _sql_strip(expr: str) -> str:
    """Python ``str.strip()`` equivalent: DuckDB ``trim`` strips only spaces
    by default, so pass the ASCII whitespace set explicitly."""
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    return f"trim({expr}, {ws})"


def sql_quality_gopher(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    strip = _sql_strip(f"coalesce({text_col}, '')")
    strip_l = _sql_strip(f"lower(coalesce({text_col}, ''))")
    return f"""
WITH base AS (
  SELECT {id_col},
         coalesce({text_col}, '') AS t,
         string_split(coalesce({text_col}, ''), chr(10)) AS lines,
         CASE WHEN {strip} = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex({strip}, '\\s+')
         END AS words,
         CASE WHEN {strip} = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex({strip_l}, '\\s+')
         END AS lwords
  FROM {table}
), m AS (
  SELECT {id_col},
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_distinct_lines,
         len(words) AS n_words,
         CAST(coalesce(list_sum(list_transform(words, w -> len(w))), 0) AS BIGINT) AS sum_word_len,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
         len(list_filter(lines, x -> regexp_matches(x, '^[ \\t]*[-*\u2022]'))) AS n_bullet_lines,
         len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|\u2026)[ \\t]*$'))) AS n_ellipsis_lines,
         length(t) - length(replace(t, '#', '')) AS n_hash_sym,
         (length(t) - length(replace(t, '...', ''))) // 3 AS n_ellipsis_sym,
         coalesce(list_max(list_transform(list_distinct(lwords),
                  w -> len(list_filter(lwords, x -> x = w)))), 0) AS max_word_count,
         len(list_filter(lwords, w -> list_contains([{stop}], w))) AS n_stop_hits
  FROM base
)
SELECT *,
       (n_words BETWEEN 50 AND 100000
        AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
        AND 10 * n_alpha_words >= 8 * n_words
        AND 10 * n_bullet_lines <= 9 * n_lines
        AND 10 * n_ellipsis_lines <= 3 * n_lines
        AND 10 * n_hash_sym <= n_words
        AND 10 * n_ellipsis_sym <= n_words
        AND 10 * (n_lines - n_distinct_lines) <= 3 * n_lines
        AND 10 * max_word_count <= 2 * n_words
        AND n_stop_hits >= 2) AS gopher_pass
FROM m
ORDER BY {id_col}
""".strip()
