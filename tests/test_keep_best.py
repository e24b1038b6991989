"""Priority dedup (keep the best-scoring cluster member): argmax-by-score
winner selection against a DuckDB window oracle and a local brute force,
through BOTH loser-removal plans (broadcast filter / anti-join)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.graph import (
    component_losers_by_score,
    connected_components,
    keep_best_by_components,
)


def _pairs_ds(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "score": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


@pytest.fixture(params=["broadcast", "anti_join"])
def force_drop_plan(request, monkeypatch):
    if request.param == "anti_join":
        from ocr_sam_project_ray.ops import graph as g

        monkeypatch.setattr(g, "BROADCAST_LOSERS_MAX", 0)
    return request.param


# clusters: {1,2,3} (chain), {10,11}, singletons 20/21 untouched
PAIRS = [(1, 2), (2, 3), (10, 11)]
DOCS = [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4), (20, 1), (21, 99)]


def _oracle_kept() -> list[int]:
    con = duckdb.connect()
    con.register("docs", _docs(DOCS))
    con.register("pairs", pa.table(
        {"id_a": pa.array([a for a, _ in PAIRS], pa.int64()),
         "id_b": pa.array([b for _, b in PAIRS], pa.int64())}
    ))
    return sorted(
        r[0] for r in con.execute("""
        WITH RECURSIVE
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        walk(node, label) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, w.label FROM edges e JOIN walk w ON w.node = e.src
        ),
        comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node),
        losers AS (
          SELECT node FROM (
            SELECT c.node, row_number() OVER (
              PARTITION BY c.component ORDER BY d.score DESC, c.node) AS rn
            FROM comp c JOIN docs d ON d.doc_id = c.node)
          WHERE rn > 1
        )
        SELECT doc_id FROM docs
        WHERE doc_id NOT IN (SELECT node FROM losers)
        """).fetchall()
    )


def test_keep_best_matches_oracle(force_drop_plan):
    comps = connected_components(_pairs_ds(PAIRS), num_partitions=2)
    kept = keep_best_by_components(
        ray.data.from_arrow(_docs(DOCS)), comps, "doc_id", "score",
        num_partitions=2,
    ).to_pandas()
    # winners: cluster {1,2,3} -> 2 (score 9 tie with 3, min id wins);
    # cluster {10,11} -> 10 (score tie, min id); singletons survive
    assert sorted(kept.doc_id) == _oracle_kept() == [2, 10, 20, 21]
    # the survivor row keeps its payload columns
    assert kept.set_index("doc_id").loc[2, "score"] == 9


def test_losers_by_score():
    comps = connected_components(_pairs_ds(PAIRS), num_partitions=2)
    losers = component_losers_by_score(
        comps, ray.data.from_arrow(_docs(DOCS)), "doc_id", "score",
        num_partitions=3,
    ).to_pandas()
    assert sorted(losers.node) == [1, 3, 11]


def test_no_clusters_is_identity(force_drop_plan):
    comps = connected_components(_pairs_ds([]), num_partitions=2)
    kept = keep_best_by_components(
        ray.data.from_arrow(_docs(DOCS)), comps, "doc_id", "score",
        num_partitions=2,
    ).to_pandas()
    assert sorted(kept.doc_id) == [d for d, _ in DOCS]


def test_differs_from_min_id_rule():
    """The point of the op: min-id dedup would keep 1, keep-best keeps 2."""
    from ocr_sam_project_ray.ops.graph import drop_by_components

    comps = connected_components(_pairs_ds(PAIRS), num_partitions=2)
    min_id = drop_by_components(
        ray.data.from_arrow(_docs(DOCS)), comps, "doc_id", num_partitions=2
    ).to_pandas()
    assert sorted(min_id.doc_id) == [1, 10, 20, 21]


def test_partition_invariance():
    comps = connected_components(_pairs_ds(PAIRS), num_partitions=4)
    a = keep_best_by_components(
        ray.data.from_arrow(_docs(DOCS)).repartition(1), comps,
        "doc_id", "score", num_partitions=1,
    ).to_pandas()
    b = keep_best_by_components(
        ray.data.from_arrow(_docs(DOCS)).repartition(5), comps,
        "doc_id", "score", num_partitions=4,
    ).to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
