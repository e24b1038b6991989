"""Gopher/C4 quality-rule suite: kernel↔SQL parity on adversarial docs,
rule semantics, and the in-batch filter path."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.quality import (
    QUALITY_COLUMNS,
    filter_quality,
    quality_row,
    score_quality,
    sql_quality_gopher,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs far away "
    "into the green forest where it finds a quiet stream and drinks "
    "slowly before the long night settles in and every sound fades out "
    "under a pale moon that hangs low over the silent trees tonight"
)

ADVERSARIAL = [
    None,
    "",
    " ",
    "\n\n\n",
    GOOD,
    "word " * 60,                      # one word repeated: fails R9
    "- item one\n- item two\n- item three",   # bullets
    "so it goes...\nand more...\nplain line",  # ellipsis lines
    "dup\ndup\ndup\nunique",           # duplicate lines
    "### markdown #### headers # everywhere " + GOOD,
    "tab\t separated \t tokens " + GOOD,
    "unicode … ellipsis ends here …",
    "• bullet unicode\n* star bullet\nnormal",
    "ses palabras no están en la lista de parada inglesa " * 8,
    "a " * 49,                          # 49 words: fails R1 low bound
    "x" * 2000,                         # one huge word: fails mean-word-len
    "ends with three dots...",
    "mixed\r\nwindows line endings\r\nhere",  # \r stays inside the line
]


def _sql_rows(texts):
    con = duckdb.connect()
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents", df)
    return con.sql(sql_quality_gopher()).df()


def test_kernel_matches_sql_on_adversarial_docs():
    got = pd.DataFrame(
        [{"doc_id": i, **quality_row(t)} for i, t in enumerate(ADVERSARIAL)]
    )
    exp = _sql_rows(ADVERSARIAL)
    for col in ["doc_id", *QUALITY_COLUMNS, "gopher_pass"]:
        assert got[col].tolist() == exp[col].tolist(), col


def test_rules_fire_as_documented():
    assert quality_row(GOOD)["gopher_pass"] is True
    assert quality_row("")["gopher_pass"] is False          # R1
    assert quality_row("word " * 60)["gopher_pass"] is False  # R9 repetition
    assert quality_row("a " * 49)["gopher_pass"] is False   # R1 low bound
    # 60 words but no English stopwords → R10
    r = quality_row("uno dos tres cuatro cinco seis " * 10)
    assert r["n_stop_hits"] == 0 and r["gopher_pass"] is False


def test_counters_exact():
    r = quality_row("dup\ndup\n- b\nend...")
    assert r["n_lines"] == 4
    assert r["n_distinct_lines"] == 3
    assert r["n_bullet_lines"] == 1
    assert r["n_ellipsis_lines"] == 1
    assert r["n_ellipsis_sym"] == 1
    assert quality_row("#tag # ##")["n_hash_sym"] == 4
    # non-overlapping '...' count matches replace-based SQL count
    assert quality_row("." * 7)["n_ellipsis_sym"] == 2


def test_score_and_filter_in_ray():
    texts = [GOOD, "", "word " * 60, GOOD + " extra tail words here"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    scored = score_quality(ds).to_pandas().sort_values("doc_id")
    assert scored.gopher_pass.tolist() == [True, False, False, True]
    kept = filter_quality(ds).to_pandas()
    assert sorted(kept.doc_id.tolist()) == [0, 3]
    # filter preserves the input schema (payload rides only inside the batch)
    assert list(kept.columns) == ["doc_id", "text"]


def test_corpus_has_variance(sf_dir="/root/testdata/sf0.001"):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    scored = score_quality(ds).to_pandas()
    frac = scored.gopher_pass.mean()
    assert 0.05 < frac < 0.95, frac


def test_metrics_batch_matches_quality_row():
    """Vectorized _metrics_batch == scalar quality_row on adversarial
    inputs (nulls, unicode bullets/ellipses, hash/dot runs, dup lines,
    case-mapping probes)."""
    from ocr_sam_project_ray.ops.quality import (
        QUALITY_COLUMNS, _metrics_batch, _passes_vec, quality_row,
    )

    texts = [
        None, "", "   ", "short text",
        "- bullet one\n* bullet two\n• three\n\tnot -\n  - yes",
        "ends...\nends… \nno end .. x\ntrail... ",
        "# #hash ### words " * 30,
        ("the quick brown fox jumps over the lazy dog and then it "
         "runs away for a while " * 10)
        + "\nrepeat line\nrepeat line\nrepeat line",
        "ΑΣ σ Σ İ ß",
        "dup dup dup DUP Dup",
        "word " * 60,
        "....... ...... .. # ## #",
    ]
    m = _metrics_batch(pa.array(texts, pa.string()))
    passes = _passes_vec(m)
    for i, t in enumerate(texts):
        r = quality_row(t)
        for c in QUALITY_COLUMNS:
            assert int(m[c][i]) == r[c], (i, c, t)
        assert bool(passes[i]) == r["gopher_pass"], (i, t)
