"""ExactSubstr-style cross-document duplicate-span dedup: engine↔SQL
parity for stats and strip, broadcast↔distributed plan equality, coverage
semantics (overlap counted once, within-doc repetition exempt)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.span_dedup import (
    _coverage_mask,
    dup_span_stats,
    sql_dup_span_stats,
    sql_strip_dup_spans,
    strip_dup_spans,
)

BOILER = "remitase copia autenticada de la presente resolucion al registro"
K = 8


def _docs() -> pa.Table:
    rows = []
    # two docs sharing the 10-token boilerplate passage mid-document
    rows.append((0, f"alpha bravo charlie {BOILER} delta echo foxtrot"))
    rows.append((1, f"golf hotel {BOILER} india juliet kilo lima"))
    # unique doc, longer than k
    rows.append((2, "one two three four five six seven eight nine ten"))
    # doc that repeats a phrase INTERNALLY only (no cross-doc dup)
    rep = "x1 x2 x3 x4 x5 x6 x7 x8"
    rows.append((3, f"{rep} mid1 mid2 {rep} tail1 tail2"))
    # short doc (< k tokens), empty, NULL
    rows.append((4, "tiny doc here"))
    rows.append((5, ""))
    rows.append((6, None))
    # a third holder of the boilerplate, at the start of the doc
    rows.append((7, f"{BOILER} zulu yankee xray"))
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )


def _oracle(tbl: pa.Table, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)].sort_values("doc_id")
            .reset_index(drop=True))


@pytest.mark.parametrize("plan", ["broadcast", "distributed"])
def test_stats_matches_sql_oracle(plan):
    tbl = _docs()
    got = dup_span_stats(
        ray.data.from_arrow(tbl), k=K, num_partitions=3, plan=plan
    ).to_pandas()
    exp = _oracle(tbl, sql_dup_span_stats(K))
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


@pytest.mark.parametrize("plan", ["broadcast", "distributed"])
def test_strip_matches_sql_oracle(plan):
    tbl = _docs()
    got = strip_dup_spans(
        ray.data.from_arrow(tbl), k=K, num_partitions=3, plan=plan
    ).to_pandas()
    exp = _oracle(tbl, sql_strip_dup_spans(K))
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_semantics_pinned():
    """The contract, spelled out: shared passages are dup in EVERY holder;
    overlapping dup grams cover their union once; internal repetition and
    short/empty docs are exempt."""
    tbl = _docs()
    got = (dup_span_stats(ray.data.from_arrow(tbl), k=K, num_partitions=2)
           .to_pandas().set_index("doc_id").sort_index())
    # the boilerplate is 9 tokens → 2 dup grams per holder (starts at the
    # 2 offsets where all 8 tokens fall inside the passage), covering all
    # 9 passage tokens — once, despite the 2 grams overlapping
    for did in (0, 1, 7):
        assert got.loc[did, "n_dup_grams"] == 2
        assert got.loc[did, "covered_tokens"] == 9
    assert got.loc[2, "n_dup_grams"] == 0  # unique doc
    assert got.loc[3, "n_dup_grams"] == 0  # within-doc repetition only
    for did in (4, 5, 6):                  # short / empty / NULL
        assert got.loc[did, "n_grams"] == 0
        assert got.loc[did, "covered_tokens"] == 0
    assert got.loc[5, "n_tokens"] == 0 and got.loc[6, "n_tokens"] == 0


def test_strip_removes_exactly_the_passage():
    tbl = _docs()
    got = (strip_dup_spans(ray.data.from_arrow(tbl), k=K, num_partitions=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert got.loc[0, "text_stripped"] == "alpha bravo charlie delta echo foxtrot"
    assert got.loc[7, "text_stripped"] == "zulu yankee xray"
    assert got.loc[0, "n_tokens_removed"] == 9
    # untouched docs come back token-stream-normalized but complete
    assert got.loc[2, "n_tokens_removed"] == 0
    assert got.loc[2, "text_stripped"] == "one two three four five six seven eight nine ten"
    assert got.loc[5, "text_stripped"] == "" and got.loc[6, "text_stripped"] == ""


@pytest.mark.parametrize("parts", [1, 2, 5])
def test_partition_invariance(parts):
    tbl = _docs()
    exp = _oracle(tbl, sql_dup_span_stats(K))
    got = dup_span_stats(
        ray.data.from_arrow(tbl), k=K, num_partitions=parts
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_coverage_mask_kernel():
    # overlapping + touching + clipped-at-end intervals
    m = _coverage_mask(np.array([0, 2, 9]), 3, 11)
    assert m.tolist() == [True, True, True, True, True,
                          False, False, False, False, True, True]
    assert _coverage_mask(np.zeros(0, dtype=np.int64), 3, 4).sum() == 0
