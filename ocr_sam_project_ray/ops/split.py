"""Deterministic train/val/test splitting — with a LEAKAGE-SAFE variant
that assigns whole near-duplicate clusters to one split.

Two ops:

1. ``hash_split`` — the standard reproducible split: bucket =
   md5("<salt>:<id>") first-8-hex mod 100; train < 80 <= val < 90 <=
   test (boundaries configurable). Stateless vectorless-hash
   ``map_batches``; no shuffle, no RNG, re-runs and backfills land every
   row in the same split forever (the property a training pipeline
   actually needs from its splitter).

2. ``leakage_safe_split`` — the published train/test-contamination fix
   (e.g. Lee et al. 2022 "Deduplicating Training Data Makes Language
   Models Better" measures cross-split near-dup leakage): hash the
   CLUSTER REPRESENTATIVE instead of the doc id, so every member of a
   near-duplicate cluster lands in the SAME split and no eval document
   has a training-set near-twin. Cluster map = the engine's certified
   connected-components output over verified near-dup pairs
   (ops/graph.connected_components, component = min reachable id);
   unpaired docs are singleton clusters (rep = own id). The (node ->
   component) map is bounded by the number of docs that appear in any
   near-dup pair — the sparse minority by construction — and is
   broadcast once via ``ray.put`` under the engine's standard bound
   (cf. graph.drop_by_components BROADCAST_DROP_MAX); above the bound
   the extension path is the tag-union co-partition used everywhere
   else (ops/graph.py).

Oracle: both are plain SQL — the identical md5 CASE chain, and for the
leakage-safe variant the same recursive-CTE cluster recompute the
near_dup_clusters oracle uses.

The reference has no dataset-splitting surface; beyond-reference
training-data op.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import configure_data_context

TRAIN_LT = 80
VAL_LT = 90
DEFAULT_SALT = "v1"
BROADCAST_COMP_MAX = 5_000_000  # (node -> component) entries


def split_of(bucket: int, train_lt: int = TRAIN_LT,
             val_lt: int = VAL_LT) -> str:
    return "train" if bucket < train_lt else (
        "val" if bucket < val_lt else "test")


def _bucket(key: str) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16) % 100


def hash_split(
    ds: Dataset, id_col: str = "doc_id", salt: str = DEFAULT_SALT,
    train_lt: int = TRAIN_LT, val_lt: int = VAL_LT,
) -> Dataset:
    """Dataset(doc_id, bucket:int64, split:string)."""
    configure_data_context()

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        buckets = [_bucket(f"{salt}:{i}") for i in ids]
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(
                    [split_of(b, train_lt, val_lt) for b in buckets],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def leakage_safe_split(
    ds: Dataset, pairs: Dataset, id_col: str = "doc_id",
    salt: str = DEFAULT_SALT, train_lt: int = TRAIN_LT,
    val_lt: int = VAL_LT, num_partitions: int = 8,
) -> Dataset:
    """Dataset(doc_id, cluster_rep:int64, bucket:int64, split:string) —
    bucket is computed from cluster_rep, so one cluster = one split.

    ``pairs`` must carry (id_a, id_b) verified near-dup edges (e.g.
    ops/dedup_text.near_dup_verified output)."""
    from .graph import connected_components

    configure_data_context()
    comp = connected_components(pairs, num_partitions=num_partitions)
    comp_map: dict[int, int] = {}
    for b in comp.iter_batches(batch_format="pyarrow"):
        comp_map.update(zip(b["node"].to_pylist(),
                            b["component"].to_pylist()))
        if len(comp_map) > BROADCAST_COMP_MAX:
            raise ValueError(
                f"near-dup component map exceeds the broadcast bound "
                f"({BROADCAST_COMP_MAX}); co-partition extension path in "
                f"ops/split.py docstring"
            )
    comp_ref = ray.put(comp_map)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(comp_ref)
        ids = batch[id_col].to_pylist()
        reps = [cm.get(i, i) for i in ids]
        buckets = [_bucket(f"{salt}:{r}") for r in reps]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_rep": pa.array(reps, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(
                    [split_of(b, train_lt, val_lt) for b in buckets],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def _sql_bucket(key_expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5({key_expr}), 1, 8) AS BIGINT) % 100"
    )


def _sql_split(bucket_expr: str, train_lt: int, val_lt: int) -> str:
    return (
        f"CASE WHEN {bucket_expr} < {train_lt} THEN 'train' "
        f"WHEN {bucket_expr} < {val_lt} THEN 'val' ELSE 'test' END"
    )


def sql_hash_split(
    table: str = "documents", id_col: str = "doc_id",
    salt: str = DEFAULT_SALT, train_lt: int = TRAIN_LT,
    val_lt: int = VAL_LT,
) -> str:
    key = f"'{salt}:' || CAST({id_col} AS VARCHAR)"
    bucket = _sql_bucket(key)
    return f"""
        SELECT {id_col},
               CAST({bucket} AS BIGINT) AS bucket,
               {_sql_split(bucket, train_lt, val_lt)} AS split
        FROM {table}
    """


def sql_leakage_safe_split(
    cluster_ctes: str, table: str = "documents", id_col: str = "doc_id",
    salt: str = DEFAULT_SALT, train_lt: int = TRAIN_LT,
    val_lt: int = VAL_LT,
) -> str:
    """``cluster_ctes`` = the recursive-CTE body ending in a ``comp``
    relation (node, component) — the near_dup_clusters oracle's builder."""
    key = "'" + salt + ":' || CAST(rep AS VARCHAR)"
    bucket = _sql_bucket(key)
    return f"""
        WITH RECURSIVE {cluster_ctes},
        withrep AS (
          SELECT d.{id_col},
                 coalesce(c.component, d.{id_col}) AS rep
          FROM {table} d LEFT JOIN comp c ON c.node = d.{id_col}
        )
        SELECT {id_col},
               CAST(rep AS BIGINT) AS cluster_rep,
               CAST({bucket} AS BIGINT) AS bucket,
               {_sql_split(bucket, train_lt, val_lt)} AS split
        FROM withrep
    """
