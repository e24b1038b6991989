"""Token-budget mixture sampling: engine↔SQL parity, budget semantics,
determinism across partitionings, and source exclusion."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.mixture import mixture_sample, sql_mixture_sample


def _docs(n_per_source=6, sources=("web", "code")):
    rows = {"doc_id": [], "text": [], "source": []}
    i = 0
    for s in sources:
        for k in range(n_per_source):
            rows["doc_id"].append(i)
            # 10 + k tokens each, text varies so hashes vary
            rows["text"].append(" ".join(f"{s}tok{k}w{j}" for j in range(10 + k)))
            rows["source"].append(s)
            i += 1
    # adversarial rows: empty, whitespace, NULL text (0 tokens each)
    for t in ["", "   ", None]:
        rows["doc_id"].append(i)
        rows["text"].append(t)
        rows["source"].append("web")
        i += 1
    return pa.table(rows)


def _oracle(tbl: pa.Table, budgets) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return (
        con.execute(sql_mixture_sample(budgets)).df()
        .sort_values("doc_id").reset_index(drop=True)
    )


def _run(tbl: pa.Table, budgets, num_partitions=3) -> pd.DataFrame:
    ds = ray.data.from_arrow(tbl)
    return (
        mixture_sample(ds, budgets, num_partitions=num_partitions)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


@pytest.mark.parametrize("budgets", [
    {"web": 40, "code": 25},
    {"web": 0, "code": 10_000},      # zero budget vs take-everything
    {"web": 9, "code": 30},          # web below its smallest admissible doc
])
def test_matches_sql_oracle(budgets):
    tbl = _docs()
    got = _run(tbl, budgets)
    exp = _oracle(tbl, budgets)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_nothing_fits_anywhere():
    """Budgets below every doc in hash order → empty selection (an
    all-empty Ray result has no schema to sort on, so assert via count)."""
    ds = ray.data.from_arrow(_docs())
    out = mixture_sample(ds, {"web": 9, "code": 9}, num_partitions=2)
    assert out.count() == len(_oracle(_docs(), {"web": 9, "code": 9})) == 0


def test_budget_semantics():
    """Inclusive running total <= budget: admitted docs' tokens never
    exceed the budget, and the next doc in hash order would not fit."""
    tbl = _docs()
    budgets = {"web": 40, "code": 25}
    got = _run(tbl, budgets)
    for src, budget in budgets.items():
        part = got[got.source == src]
        assert part.n_tokens.sum() <= budget
        assert (part.cum_tokens <= budget).all()
    # zero-token docs (empty/NULL text) cost nothing and are admitted
    # wherever the running total stands — verified via oracle parity above


def test_source_exclusion():
    """Sources absent from the budgets dict contribute nothing."""
    tbl = _docs()
    got = _run(tbl, {"code": 10_000})
    assert set(got.source) == {"code"}
    assert len(got) == 6


@pytest.mark.parametrize("parts", [1, 2, 6])
def test_partition_invariance(parts):
    tbl = _docs()
    budgets = {"web": 55, "code": 34}
    exp = _oracle(tbl, budgets)
    got = _run(tbl, budgets, num_partitions=parts)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_deterministic_under_input_shuffle():
    """The selection depends only on content hashes, not input order."""
    tbl = _docs()
    budgets = {"web": 50, "code": 50}
    base = _run(tbl, budgets)
    # reverse the input row order
    rev = tbl.take(list(range(tbl.num_rows - 1, -1, -1)))
    again = _run(rev, budgets)
    pd.testing.assert_frame_equal(base, again)
