"""PII redaction: replace identifier-shaped spans in a text column with
typed placeholders, counting what was redacted — the scrubbing stage every
LLM training-data pipeline runs before text leaves the corpus.

The kernel is pure ``pyarrow.compute`` (``replace_substring_regex`` /
``count_substring_regex``), i.e. RE2 — the SAME regex engine DuckDB uses —
so the SQL oracle (sequential ``regexp_replace(..., 'g')`` over the golden
text) recomputes the engine output exactly, pattern for pattern.

Rules fire in a FIXED order and each rule sees the previous rule's output:
the cedula rule (``6-603-1979`` → ``<ID>``) runs before the phone rule
(``555-1234`` → ``<PHONE>``) so a phone-shaped tail inside an already
redacted cedula can never double-fire.  Counts are taken on the text the
rule actually saw.  Behavioral lineage: the identifier patterns are the
reference's validation regexes (src/services/ocr_service.py pattern table,
see functions/patterns.py) repurposed as redaction targets; the reference
itself has no scrubbing stage — this op is part of the engine's
beyond-reference training-data surface.

Scale notes: stateless vectorized ``map_batches`` (zero shuffle, zero
Python-per-row work); RE2 scans are linear-time with no backtracking, so
worst-case adversarial text cannot blow up a worker.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, placeholder) — order matters and is part of the
# contract; sql_rules() renders the same order for the oracle.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("ids", r"\b\d{1,2}-\d{1,4}-\d{1,4}\b", "<ID>"),
    ("phones", r"\b\d{3}-\d{4}\b", "<PHONE>"),
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text",
                 out_col: str = "redacted_text") -> pa.Table:
    """Vectorized redaction over one Arrow batch: appends ``out_col`` plus
    one ``n_<rule>`` int64 column per rule."""
    cur = pc.cast(batch.column(text_col), pa.string())
    counts: list[tuple[str, pa.Array]] = []
    for name, pattern, placeholder in PII_RULES:
        counts.append(
            (f"n_{name}", pc.cast(pc.count_substring_regex(cur, pattern=pattern),
                                  pa.int64()))
        )
        cur = pc.replace_substring_regex(cur, pattern=pattern,
                                         replacement=placeholder)
    out = batch.append_column(out_col, cur)
    for cname, arr in counts:
        out = out.append_column(cname, arr)
    return out


def redact_pii(ds, text_col: str = "text", out_col: str = "redacted_text"):
    """Dataset → Dataset with ``out_col`` + per-rule ``n_<rule>`` counts.
    Stateless task-pool stage; callers pick columns afterwards."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
    )


def sql_rules(expr: str) -> tuple[str, dict[str, str]]:
    """Render the rule chain as SQL: returns (redacted_expr, {count_col:
    count_expr}) where each count is computed on the text the rule saw —
    byte-for-byte the engine's semantics, for the DuckDB oracle."""
    cur = expr
    count_exprs: dict[str, str] = {}
    for name, pattern, placeholder in PII_RULES:
        pat_sql = pattern.replace("'", "''")
        count_exprs[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({cur}, '{pat_sql}')) AS BIGINT)"
        )
        cur = f"regexp_replace({cur}, '{pat_sql}', '{placeholder}', 'g')"
    return cur, count_exprs
