"""Distributed connected components over a pair-edge Dataset — the
transitive cluster resolution the near-dup drop step needs at scale
(single-link by pair is wrong for chains a~b~c where (a,c) is not a direct
pair; the standard is: one survivor per CONNECTED COMPONENT).

Two plans, chosen by measured edge count:

- ≤ DRIVER_CC_MAX_EDGES: one driver union-find over a bounded edge stream
  (≤32 MB) — below this, the per-round distributed fixed costs dwarf the
  work (same bounded-fast-path pattern as stages/dedup's winner pre-pass).
- above: iterative min-label propagation expressed in Dataset ops. Each
  round tags labels + edges, hash-repartitions on the key, and performs
  the label push as a PARTITION-LOCAL pyarrow acero join inside each
  block, then folds with one groupby-min. (Ray's distributed Dataset.join
  is deliberately avoided inside the loop: its shuffle skips empty input
  blocks before the schema broadcast, and the iterated labels table
  legitimately carries empty blocks.) Labels only ever decrease, so
  ``sum(label)`` is a monotone convergence witness: a round that leaves
  the sum unchanged is the fixpoint — one scalar per round on the driver.

Each round pushes labels along BOTH the real edges and the current label
POINTERS (label(u) → u, i.e. pointer jumping: u can learn
label(label(u)) in one round). Plain neighbor propagation needs rounds =
the largest component's min-label eccentricity — an adversarial chained-
duplicate corpus (a~b~…~z) would walk the whole path; the pointer-jump
rows halve the remaining depth each round, so convergence is O(log
diameter) and a 10k-node path resolves in ~15 rounds (pinned by
test_graph). ``max_rounds`` stays as a hard bound; non-convergence raises
rather than silently returning partial labels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context


def coerce_empty_blocks(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Rewrite empty blocks to carry ``schema``. Hash-shuffle groupbys and
    joins can emit schema-less empty blocks for empty partitions, which
    breaks a downstream join's key-field resolution ("no match for field
    reference"); this pins every block to the declared schema."""

    def fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return t.select([f.name for f in schema]).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow")


def _sym_edges(pairs: Dataset, a: str, b: str) -> Dataset:
    """(id_a, id_b) pairs → symmetric (src, dst) edge list."""

    def explode(batch: pa.Table) -> pa.Table:
        src = pa.concat_arrays(
            [batch[a].combine_chunks(), batch[b].combine_chunks()]
        )
        dst = pa.concat_arrays(
            [batch[b].combine_chunks(), batch[a].combine_chunks()]
        )
        return pa.table({"src": src, "dst": dst})

    return pairs.map_batches(explode, batch_format="pyarrow")


DRIVER_CC_MAX_EDGES = 2_000_000  # ≈32 MB of int64 pairs on the driver


def connected_components(
    pairs: Dataset,
    a: str = "id_a",
    b: str = "id_b",
    num_partitions: int = 4,
    max_rounds: int = 40,
) -> Dataset:
    """(node, component) for every node appearing in ``pairs``; component =
    the minimum node id reachable from it. Plan selection and the round
    structure are described in the module docstring; duplicate edges are
    harmless (min-fold and union-find are both idempotent over them)."""
    from ray.data.aggregate import Min, Sum

    import ray.data

    configure_data_context()
    edges = _sym_edges(pairs, a, b).materialize()  # reused every round
    n_edges = edges.count()
    if n_edges == 0:  # empty pair set → schema-stable empty result
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )
    # each round pays fixed scheduling latency PER PARTITION; size the
    # partition count to the edge set (≈50k edges/partition) so small pair
    # sets converge in seconds while huge ones still spread out
    num_partitions = max(1, min(num_partitions, n_edges // 50_000 + 1))

    # bounded fast path (same pattern as stages/dedup.DRIVER_WINNERS_MAX_ROWS):
    # below the threshold, per-round distributed fixed costs dwarf the work —
    # one driver union-find over ≤32 MB of edges is exact and instant. The
    # iterative distributed path below remains the >threshold route.
    if n_edges <= DRIVER_CC_MAX_EDGES:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for batch in edges.iter_batches(batch_format="pyarrow"):
            for s, d in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
                parent.setdefault(s, s)
                parent.setdefault(d, d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[max(rs, rd)] = min(rs, rd)
        nodes = sorted(parent)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "component": pa.array([find(n) for n in nodes], pa.int64()),
                }
            )
        )

    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    # initial labels: each node labels itself
    labels = coerce_empty_blocks(
        edges.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("label", alias_name="label")),
        label_schema,
    ).materialize()

    def _checksum(lab: Dataset) -> int:
        row = lab.aggregate(Sum("label", alias_name="s"))
        return int(row["s"]) if row and row["s"] is not None else 0

    # The per-round src→dst label push is a partition-local Arrow join:
    # tag both sides, hash-repartition on the key, and acero-join inside
    # each block. (Ray's distributed Dataset.join is avoided here on
    # purpose: its shuffle drops empty input blocks before the schema
    # broadcast, and the iterated labels table legitimately carries empty
    # blocks for empty hash partitions.)
    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["node"],
                "dst": pa.nulls(t.num_rows, pa.int64()),
                "label": t["label"],
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["src"],
                "dst": t["dst"],
                "label": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def local_push(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return label_schema.empty_table()
        lab = t.filter(pc.is_valid(t["label"])).select(["key", "label"])
        edg = t.filter(pc.is_valid(t["dst"])).select(["key", "dst"])
        pushed = edg.join(lab, keys="key", join_type="inner")
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        pushed["dst"].combine_chunks(),
                        lab["key"].combine_chunks(),
                    ]
                ),
                "label": pa.concat_arrays(
                    [
                        pushed["label"].combine_chunks(),
                        lab["label"].combine_chunks(),
                    ]
                ),
            }
        )

    def tag_jump(t: pa.Table) -> pa.Table:
        # pointer-jump rows: a transient edge label(u) → u, so the push
        # below delivers label(label(u)) to u — halves remaining chain
        # depth every round (O(log diameter) total, see module docstring)
        return pa.table(
            {
                "key": t["label"],
                "dst": t["node"],
                "label": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    prev = _checksum(labels)
    for _ in range(max_rounds):
        tagged = (
            labels.map_batches(tag_labels, batch_format="pyarrow")
            .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
            .union(labels.map_batches(tag_jump, batch_format="pyarrow"))
        )
        folded = tagged.repartition(
            num_blocks=num_partitions, keys=["key"]
        ).map_batches(local_push, batch_format="pyarrow", batch_size=None)
        labels = coerce_empty_blocks(
            folded.groupby("node", num_partitions=num_partitions).aggregate(
                Min("label", alias_name="label")
            ),
            label_schema,
        ).materialize()
        cur = _checksum(labels)
        if cur == prev:
            return labels.map_batches(
                lambda t: pa.table({"node": t["node"], "component": t["label"]}),
                batch_format="pyarrow",
            )
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "with pointer jumping this needs ~log2(component diameter) rounds, "
        "so raise max_rounds only for truly astronomical graphs"
    )


def component_losers(components: Dataset) -> Dataset:
    """Nodes that are NOT their component's minimum (the drop set)."""
    return components.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["component"])).select(
            ["node"]
        ),
        batch_format="pyarrow",
    )


_NP_DTYPES = {
    "float": "float32", "double": "float64",
    "int64": "int64", "int32": "int32",
}


def _list_columns(schema: pa.Schema) -> list[tuple[str, str]]:
    """(name, numpy dtype) for primitive-valued list columns — Ray's hash
    join rejects list-typed non-key fields, so they ride through joins
    packed as binary."""
    out = []
    for field in schema:
        t = field.type
        if pa.types.is_list(t) or pa.types.is_large_list(t) or \
                pa.types.is_fixed_size_list(t):
            np_dtype = _NP_DTYPES.get(str(t.value_type))
            if np_dtype is not None:
                out.append((field.name, np_dtype))
    return out


BROADCAST_LOSERS_MAX = 5_000_000  # ≈40 MB of int64 ids broadcast once


def drop_by_components(
    ds: Dataset, components: Dataset, id_col: str, num_partitions: int = 4
) -> Dataset:
    """Keep one survivor (the min id) per component.

    Loser removal picks the cheaper of two exact plans by measured loser
    count (both bounded, both distributed-safe):
    - ≤ BROADCAST_LOSERS_MAX: broadcast the loser-id array once (ray.put)
      and filter every batch with a vectorized ``pc.is_in`` — ZERO shuffle
      of ``ds`` (the same broadcast-filter pattern as the url dedup).
    - above: hash ANTI-JOIN against the loser Dataset — one shuffle, no
      driver-side set of unbounded size. List-typed columns (embeddings)
      are packed to binary for the join and unpacked bit-identically after
      (the hash join rejects list non-key fields)."""
    return _drop_loser_ids(ds, component_losers(components), id_col,
                           num_partitions)


def _drop_loser_ids(
    ds: Dataset, losers: Dataset, id_col: str, num_partitions: int
) -> Dataset:
    """Shared loser-removal plans (broadcast filter / anti-join) for any
    Dataset(node) of ids to drop — see drop_by_components docstring."""
    import numpy as np

    # compact the loser side: the join's shuffle loses its schema broadcast
    # when an input's first block is empty, so feed it only non-empty blocks
    losers = losers.materialize()
    n_losers = losers.count()
    if n_losers == 0:
        return ds

    if n_losers <= BROADCAST_LOSERS_MAX:
        parts = [
            b["node"].combine_chunks()
            for b in losers.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        loser_arr = pa.concat_arrays(parts)
        loser_ref = ray.put(loser_arr)

        def drop(batch: pa.Table) -> pa.Table:
            arr = ray.get(loser_ref)
            return batch.filter(
                pc.invert(pc.is_in(batch[id_col], value_set=arr))
            )

        return ds.map_batches(drop, batch_format="pyarrow")

    losers = losers.repartition(num_blocks=min(num_partitions, n_losers))

    list_cols = _list_columns(ds.schema().base_schema)

    def pack(batch: pa.Table) -> pa.Table:
        for name, np_dtype in list_cols:
            vals = batch[name].to_pylist()
            packed = pa.array(
                [None if v is None else np.asarray(v, dtype=np_dtype).tobytes()
                 for v in vals],
                pa.binary(),
            )
            batch = batch.set_column(
                batch.column_names.index(name), name, packed
            )
        return batch

    def unpack(batch: pa.Table) -> pa.Table:
        for name, np_dtype in list_cols:
            vals = batch[name].to_pylist()
            restored = pa.array(
                [None if v is None else np.frombuffer(v, dtype=np_dtype)
                 for v in vals],
                pa.list_(pa.from_numpy_dtype(np.dtype(np_dtype))),
            )
            batch = batch.set_column(
                batch.column_names.index(name), name, restored
            )
        return batch

    if list_cols:
        ds = ds.map_batches(pack, batch_format="pyarrow")
    kept = ds.join(
        losers,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("node",),
    )
    if list_cols:
        kept = kept.map_batches(unpack, batch_format="pyarrow")
    return kept


def component_losers_by_score(
    components: Dataset, ds: Dataset, id_col: str, score_col: str,
    num_partitions: int = 4,
) -> Dataset:
    """Nodes that are NOT their component's best-scoring member — the
    CCNet/RefinedWeb priority-dedup rule: within each duplicate cluster
    keep the HIGHEST-``score_col`` document (ties → min id), not the min
    id. Integer score columns recommended (no float-comparison traps).

    Plan (payload-free, two bounded shuffles): the score side is
    ``ds.select_columns([id, score])`` (two ints/doc) tag-unioned with the
    component rows and co-partitioned on the node id (partition-local
    score attach — no Dataset.join); scored component rows are then
    co-partitioned on the component id, where each partition holds whole
    components and picks winners with one vectorized lexsort."""
    import numpy as np

    configure_data_context()
    node_type = components.schema().base_schema.field("node").type
    comp_type = components.schema().base_schema.field("component").type
    scores = ds.select_columns([id_col, score_col])

    def tag_comp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["node"],
                "component": batch["component"],
                "score": pa.array([0] * n, pa.int64()),
                "side": pa.array([1] * n, pa.int8()),
            }
        )

    def tag_score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch[id_col].cast(node_type),
                "component": pa.array([None] * n, comp_type),
                "score": batch[score_col].cast(pa.int64()),
                "side": pa.array([0] * n, pa.int8()),
            }
        )

    unioned = components.map_batches(tag_comp, batch_format="pyarrow").union(
        scores.map_batches(tag_score, batch_format="pyarrow")
    ).repartition(num_blocks=num_partitions, keys=["key"])

    def attach(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"component": pa.array([], comp_type),
             "node": pa.array([], node_type),
             "score": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        is_comp = pc.equal(batch["side"], 1)
        comp_rows = batch.filter(is_comp)
        if comp_rows.num_rows == 0:
            return empty
        score_rows = batch.filter(pc.invert(is_comp))
        local = dict(zip(score_rows["key"].to_pylist(),
                         score_rows["score"].to_pylist()))
        return pa.table(
            {
                "component": comp_rows["component"],
                "node": comp_rows["key"],
                "score": pa.array(
                    [local[n] for n in comp_rows["key"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    scored = unioned.map_batches(attach, batch_format="pyarrow",
                                 batch_size=None)
    by_comp = scored.repartition(num_blocks=num_partitions,
                                 keys=["component"])

    def losers(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"node": pa.array([], node_type)})
        comp = batch["component"].to_numpy(zero_copy_only=False)
        node = batch["node"].to_numpy(zero_copy_only=False)
        score = batch["score"].to_numpy(zero_copy_only=False)
        # winner per component = first row in (component, -score, node)
        # order; np.lexsort keys are last-is-primary
        order = np.lexsort((node, -score, comp))
        first = np.ones(len(order), dtype=bool)
        sc = comp[order]
        first[1:] = sc[1:] != sc[:-1]
        loser_nodes = node[order][~first]
        return pa.table({"node": pa.array(loser_nodes, node_type)})

    return by_comp.map_batches(losers, batch_format="pyarrow",
                               batch_size=None)


def keep_best_by_components(
    ds: Dataset, components: Dataset, id_col: str, score_col: str,
    num_partitions: int = 4,
) -> Dataset:
    """Keep the best-``score_col`` survivor (ties → min id) per component;
    loser removal reuses the broadcast-filter / anti-join plans of
    drop_by_components."""
    losers = component_losers_by_score(components, ds, id_col, score_col,
                                       num_partitions)
    return _drop_loser_ids(ds, losers, id_col, num_partitions)
