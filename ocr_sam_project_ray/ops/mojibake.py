"""Mojibake repair — the ftfy-style "UTF-8 bytes were decoded as
Latin-1" fixer every web-text pipeline runs before dedup/quality (ftfy,
Speer 2019; CCNet and C4 both normalize encodings before filtering).

The classic corruption: a UTF-8 document read as Latin-1 turns every
non-ASCII char into a 2-char digraph ("é" -> "Ã©", "ü" -> "Ã¼",
"©" -> "Â©"). Two kernels:

1. ``repair_chain`` — the ORACLE-CHECKABLE contract: a fixed table of the
   94 Latin-1-supplement digraphs (U+00A0..U+00FF minus the two lead
   bytes U+00C2/U+00C3 themselves), applied as one SEQUENTIAL literal
   replace chain in codepoint order. Both the engine (chained
   ``pc.replace_substring`` — each step a vectorized Arrow kernel) and
   the DuckDB twin (``sql_mojibake_query``: the identical replace chain,
   staged in CTEs under the binder depth cap) run the exact same chain,
   so outputs are
   byte-identical BY CONSTRUCTION on any input. A vectorized pre-filter
   (``pc.match_substring`` on the two lead chars) skips clean rows, so
   the 94-step chain only touches the mojibake-suspect minority.
2. ``repair_roundtrip`` — the GENERAL kernel (ftfy's core heuristic):
   per suspect row, try ``text.encode('latin-1').decode('utf-8')`` with
   strict errors; keep the repair only if both succeed and the result
   has fewer non-ASCII chars than the input. Handles 3- and 4-byte
   sequences (CJK, emoji) the digraph table cannot; not SQL-expressible,
   so it is pytest-certified (equality with repair_chain on
   Latin-1-supplement-only corruption, plus CJK/emoji round-trips).

Why the lead bytes are excluded from the chain: a corrupted U+00C2/C3
("Â"/"Ã") expands to a digraph whose FIRST char is again a lead char, so
including them makes the sequential chain order-sensitive on adversarial
input; excluding them keeps chain-repair idempotent on its own output
domain while still covering the 94 characters that dominate real
mojibake (accented Latin, punctuation, symbols). The roundtrip kernel
covers the rest.

Scale shape: stateless ``map_batches``; the digraph table is a module
constant (no broadcast needed); suspect pre-filter keeps the per-batch
cost at one vectorized scan for clean data.

The reference normalizes encodings nowhere (Textract returns clean
text); beyond-reference web-text op.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import configure_data_context

# lead chars of 2-byte UTF-8 sequences for U+00A0..U+00FF read as Latin-1
_LEADS = ("Â", "Ã")

# (mojibake digraph, true char) in codepoint order, excluding the leads
MOJIBAKE_TABLE: list[tuple[str, str]] = [
    (chr(c).encode("utf-8").decode("latin-1"), chr(c))
    for c in range(0xA0, 0x100)
    if c not in (0xC2, 0xC3)
]


def corrupt_chain(arr: pa.ChunkedArray | pa.Array):
    """The inverse chain (true char -> digraph), used to decorate test/
    oracle inputs so every rule demonstrably fires. Same sequential
    semantics as the SQL twin."""
    cur = pc.cast(arr, pa.string())
    for pat, rep in MOJIBAKE_TABLE:
        cur = pc.replace_substring(cur, pattern=rep, replacement=pat)
    return cur


def repair_chain_array(arr: pa.ChunkedArray | pa.Array):
    """Sequential digraph->char repair over one Arrow array."""
    cur = pc.cast(arr, pa.string())
    suspect = pc.or_kleene(
        pc.match_substring(cur, _LEADS[0]),
        pc.match_substring(cur, _LEADS[1]),
    )
    n_suspect = pc.sum(pc.cast(suspect, pa.int64())).as_py() or 0
    if n_suspect == 0:
        return cur
    fixed = cur
    for pat, rep in MOJIBAKE_TABLE:
        fixed = pc.replace_substring(fixed, pattern=pat, replacement=rep)
    return pc.if_else(suspect, fixed, cur)


def repair_mojibake(
    ds: Dataset, text_col: str = "text", out_col: str = "text_fixed",
) -> Dataset:
    """Chain repair -> Dataset(+out_col:string, +changed:bool)."""
    configure_data_context()

    def fix(batch: pa.Table) -> pa.Table:
        fixed = repair_chain_array(batch[text_col])
        changed = pc.not_equal(
            pc.coalesce(fixed, pa.scalar("", pa.string())),
            pc.coalesce(
                pc.cast(batch[text_col], pa.string()),
                pa.scalar("", pa.string()),
            ),
        )
        return batch.append_column(out_col, fixed).append_column(
            "changed", pc.cast(changed, pa.bool_())
        )

    return ds.map_batches(fix, batch_format="pyarrow")


# a plausible UTF-8 byte sequence rendered as Latin-1 chars: 2-, 3- or
# 4-byte lead followed by the right number of continuation-range chars
_ROUNDTRIP_SUSPECT = __import__("re").compile(
    "[\u00c2-\u00df][\u0080-\u00bf]"
    "|[\u00e0-\u00ef][\u0080-\u00bf]{2}"
    "|[\u00f0-\u00f4][\u0080-\u00bf]{3}"
)


def repair_roundtrip(text: str | None) -> str | None:
    """General ftfy-style repair for one string (pytest-certified).

    Gate = at least one complete lead+continuation mojibake sequence.
    Known false-positive class (shared with any roundtrip repairer):
    legitimate text whose chars happen to spell a valid UTF-8 sequence
    (e.g. 'É©') repairs to the single char; the improvement check below
    (strictly fewer non-ASCII chars) is the standard mitigation."""
    if text is None or not _ROUNDTRIP_SUSPECT.search(text):
        return text
    try:
        repaired = text.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text
    n_non_ascii = sum(1 for ch in text if ord(ch) > 0x7F)
    r_non_ascii = sum(1 for ch in repaired if ord(ch) > 0x7F)
    return repaired if r_non_ascii < n_non_ascii else text


# DuckDB's binder caps expression depth at 128, so the 94-step chain is
# rendered as staged subqueries of <= _SQL_CHUNK nested replaces each.
_SQL_CHUNK = 47


def _sql_chain_stages(table: list[tuple[str, str]],
                      reverse: bool = False) -> list[str]:
    """The chain as a list of expression templates; each stage is applied
    to the previous stage's output column, spliced in for '{t}'."""
    stages, cur, n = [], "{t}", 0
    for pat, rep in table:
        if reverse:
            pat, rep = rep, pat
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        cur = f"replace({cur}, '{p}', '{r}')"
        n += 1
        if n == _SQL_CHUNK:
            stages.append(cur)
            cur, n = "{t}", 0
    if n:
        stages.append(cur)
    return stages


def sql_mojibake_query(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    decorate: bool = True,
) -> str:
    """Full DuckDB twin statement of (optionally corrupt_chain, then)
    repair_mojibake: SELECT (id_col, text_fixed, changed). The suspect
    gate mirrors repair_chain_array; staged CTEs keep every expression
    under the binder depth cap."""
    ctes, src, col = [], table, text_col
    if decorate:
        for i, st in enumerate(_sql_chain_stages(MOJIBAKE_TABLE,
                                                 reverse=True)):
            ctes.append(
                f"c{i} AS (SELECT {id_col}, "
                f"{st.format(t=col)} AS t FROM {src})"
            )
            src, col = f"c{i}", "t"
    base = (
        f"b AS (SELECT {id_col}, {col} AS t, "
        f"({col} LIKE '%Â%' OR {col} LIKE '%Ã%') AS suspect FROM {src})"
    )
    ctes.append(base)
    src, col = "b", "t"
    for i, st in enumerate(_sql_chain_stages(MOJIBAKE_TABLE)):
        ctes.append(
            f"r{i} AS (SELECT {id_col}, t, suspect, "
            f"{st.format(t='f' if i else 't')} AS f FROM {src})"
        )
        src = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT {id_col},
               CASE WHEN suspect THEN f ELSE t END AS text_fixed,
               coalesce(CASE WHEN suspect THEN f ELSE t END, '')
                 <> coalesce(t, '') AS changed
        FROM {src}
        """
    )
