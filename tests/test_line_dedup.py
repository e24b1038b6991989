"""C4-style corpus-global line dedup: engine↔SQL parity on adversarial
fixtures, broadcast↔distributed plan equality, and partition invariance."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.line_dedup import line_dedup, line_winners

_ORACLE = """
WITH ls AS (
  SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS parts FROM seg
),
lines AS (
  SELECT doc_id, unnest(parts) AS line,
         unnest(generate_series(1, len(parts))) AS i
  FROM ls
),
ranked AS (
  SELECT doc_id, i, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, i) AS rn
  FROM lines
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY i)
                FILTER (WHERE rn = 1), '') AS text_deduped,
       count(*) FILTER (WHERE rn = 1) AS n_lines_kept,
       count(*) FILTER (WHERE rn > 1) AS n_lines_dropped
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""

# adversarial corpus: within-doc repeats, cross-doc boilerplate, empty
# lines contested across docs, NULL text, a doc that loses every line,
# and winner ties that hinge on (doc_id, idx) ordering.
FIXTURE = {
    "doc_id": [7, 1, 3, 2, 9, 4, 5],
    "text": [
        "footer\nbody seven\nfooter",        # loses footer to doc 1
        "header\nfooter\nheader",            # wins header@0, footer@1
        "body three\nheader\nfooter",        # loses both boilerplate lines
        "",                                  # wins the empty line
        "",                                  # loses the empty line -> ''
        None,                                # NULL -> one empty line, lost
        "header",                            # whole doc is boilerplate
    ],
}


def _oracle_df(tbl: pa.Table) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("seg", tbl)
    return con.execute(_ORACLE).df()


def _run(tbl: pa.Table, plan: str, num_partitions: int = 3) -> pd.DataFrame:
    ds = ray.data.from_arrow(tbl)
    return (
        line_dedup(ds, id_col="doc_id", text_col="text", plan=plan,
                   num_partitions=num_partitions)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


@pytest.mark.parametrize("plan", ["broadcast", "distributed"])
def test_matches_sql_oracle(plan):
    tbl = pa.table(FIXTURE)
    got = _run(tbl, plan)
    exp = _oracle_df(tbl)
    pd.testing.assert_frame_equal(got, exp)


def test_semantics_pinned():
    """Hand-computed expectations, independent of DuckDB."""
    got = _run(pa.table(FIXTURE), "broadcast")
    by_id = {r.doc_id: r for r in got.itertuples()}
    # doc 1 keeps header+footer once (its own repeat of header drops)
    assert by_id[1].text_deduped == "header\nfooter"
    assert by_id[1].n_lines_dropped == 1
    # doc 3 keeps only its unique body line
    assert by_id[3].text_deduped == "body three"
    assert by_id[3].n_lines_dropped == 2
    # doc 2 wins the corpus-wide empty line; docs 9 and 4 lose it
    assert by_id[2].n_lines_kept == 1 and by_id[2].text_deduped == ""
    assert by_id[9].n_lines_kept == 0 and by_id[9].text_deduped == ""
    assert by_id[4].n_lines_kept == 0  # NULL text behaves as ''
    # doc 5 is pure boilerplate -> nothing survives
    assert by_id[5].n_lines_kept == 0 and by_id[5].n_lines_dropped == 1
    # doc 7 keeps its body and its leading footer loses to doc 1's
    assert by_id[7].text_deduped == "body seven"
    # global invariant: every distinct line kept exactly once
    assert int(got.n_lines_kept.sum()) == 5  # header footer body3 body7 ''


@pytest.mark.parametrize("parts", [1, 2, 5])
def test_partition_invariance_and_plan_equality(parts):
    tbl = pa.table(FIXTURE)
    exp = _oracle_df(tbl)
    for plan in ("broadcast", "distributed"):
        got = _run(tbl, plan, num_partitions=parts)
        pd.testing.assert_frame_equal(got, exp)


def test_combiner_crosses_batches():
    """Winners must resolve globally even when every doc is its own batch
    and the duplicate pair lands in different combiner batches."""
    n = 40
    tbl = pa.table(
        {
            "doc_id": list(range(n)),
            "text": [f"unique {i}\nshared boilerplate line" for i in range(n)],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = (
        line_dedup(ds, id_col="doc_id", text_col="text", num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.loc[0, "text_deduped"] == "unique 0\nshared boilerplate line"
    assert (got.loc[1:, "n_lines_dropped"] == 1).all()
    assert int(got.n_lines_kept.sum()) == n + 1


def test_string_ids():
    """Segment-style string doc ids: winner order is lexicographic."""
    tbl = pa.table(
        {
            "doc_id": ["u#seg10", "u#seg2", "u#seg1"],
            "text": ["dup", "dup", "dup"],
        }
    )
    got = _run(tbl, "broadcast")
    exp = _oracle_df(tbl)
    pd.testing.assert_frame_equal(got, exp)
    # lexicographic: "u#seg1" < "u#seg10" < "u#seg2"
    winner = got[got.n_lines_kept == 1].doc_id.tolist()
    assert winner == ["u#seg1"]


def test_line_winners_counts():
    tbl = pa.table(FIXTURE)
    w = (
        line_winners(ray.data.from_arrow(tbl), id_col="doc_id",
                     text_col="text", num_partitions=3)
        .to_pandas().set_index("line")
    )
    assert w.loc["header", "n_occ"] == 4
    assert w.loc["footer", "n_occ"] == 4
    assert w.loc["", "n_occ"] == 3
    assert w.loc["header", "win_id"] == 1 and w.loc["header", "win_idx"] == 0
