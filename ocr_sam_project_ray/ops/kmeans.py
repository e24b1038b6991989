"""Distributed k-means over an embedding column + SemDeDup semantic
near-dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

kmeans_fit is full-corpus Lloyd's as mergeable map_batches partials —
NOT the bounded-sample k-means-lite of embed.knn_ivf (which trains on
``limit(sample_rows)``): every iteration each batch emits per-centroid
(sum_vec, count) partial rows; the driver folds k×(dim+1) doubles per
block (bounded: k × dim state, independent of corpus size) into the next
centroids. Deterministic: farthest-point (greedy k-center) seeding with
min-id tie-breaks, fixed iteration count, no RNG anywhere.

semdedup composes the engine's existing certified pieces:
  kmeans assign (broadcast centroids, one matmul per batch)
  → within-cluster cosine pairs ≥ eps (cluster-bucketed, the IVF
    bucket-compare shape; ×1 fan-out since each vector has ONE cluster)
  → graph.connected_components → graph.drop_by_components (min-id
    survivor; swap in keep_best_by_components for priority rules).
Approximate by construction — pairs split across cluster boundaries are
missed, the standard SemDeDup trade-off; with n_clusters=1 it is EXACT
(equality-tested against the brute-force kernel in pytest), and recall
on clustered synthetic data is floor-tested like knn_ivf.

Scale notes: centroid state is k×dim (broadcast once per iteration);
the only shuffle is the per-cluster repartition of (id, cluster,
embedding) before pair generation; within-cluster compare is O(sum of
cluster-size²) — pick n_clusters so the expected cluster fits a worker
(SemDeDup's own recipe), and the hot-cluster guard counts any cluster
skipped over ``max_cluster_rows`` instead of dying (no silent caps:
counts are returned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import configure_data_context
from .embed import _batch_matrix, _normalize, chunked_upper_pairs

DEFAULT_ITERS = 8
MAX_CLUSTER_ROWS = 100_000
SEED_SAMPLE_ROWS = 65_536


def _farthest_point_seeds(
    ds: Dataset, k: int, id_col: str, emb_col: str,
    sample_rows: int = SEED_SAMPLE_ROWS,
) -> np.ndarray:
    """Deterministic farthest-point init (greedy k-center, Gonzalez 1985;
    the derandomized cousin of k-means++): seed 0 is the min-id vector;
    each next seed is the vector with the smallest maximum cosine to the
    seeds so far (ties → min id). No RNG anywhere.

    The recursion runs over a deterministic hash-order sample: ONE corpus
    pass keeps, per block, the ``sample_rows`` rows with the smallest
    (splitmix64(id), id) — a lossless prune for the global bottom-m —
    and the driver folds blocks into the bounded global sample, then runs
    the k-center recursion locally over the (m, dim) matrix. With
    ≤ sample_rows corpus rows the sample IS the corpus and the seeds are
    bit-identical to the full-corpus recursion (pinned in test_kmeans);
    above it, seeding stays deterministic on a representative hash sample
    and Lloyd's full-corpus iterations do the refining. This replaced a
    k-passes-over-the-corpus recursion — the round-4 sf1 bench measured
    seeding dominating semdedup wall at 500k docs. Driver state:
    8·m·dim bytes (lower sample_rows for high-dim model embeddings)."""

    def sample_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "sid": pa.array([], pa.int64()),
                             "emb": pa.array([], pa.binary())})
        from .dedup_text import _splitmix64

        h = _splitmix64(ids.astype(np.uint64)).view(np.int64)
        m = _batch_matrix(batch, emb_col)
        if ids.size > sample_rows:
            keep = np.lexsort((ids, h))[:sample_rows]
            ids, h, m = ids[keep], h[keep], m[keep]
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "sid": pa.array(ids, pa.int64()),
             "emb": pa.array([r.tobytes() for r in m], pa.binary())}
        )

    # batch_size=None: the per-BLOCK prune above is the whole point —
    # the default 1024-row batching would never trigger it and stream
    # every row to the driver. The driver prune is amortized (only when
    # the buffer doubles past sample_rows) so the fold does O(log)
    # lexsorts, not one per incoming batch.
    parts_h, parts_id, parts_m = [], [], []
    buffered = 0

    def _prune():
        nonlocal parts_h, parts_id, parts_m, buffered
        h = np.concatenate(parts_h)
        i = np.concatenate(parts_id)
        m = np.concatenate(parts_m)
        if len(h) > sample_rows:
            keep = np.lexsort((i, h))[:sample_rows]
            h, i, m = h[keep], i[keep], m[keep]
        parts_h, parts_id, parts_m = [h], [i], [m]
        buffered = len(h)

    for b in ds.map_batches(
        sample_partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        parts_h.append(b["h"].combine_chunks().to_numpy(zero_copy_only=False))
        parts_id.append(b["sid"].combine_chunks().to_numpy(zero_copy_only=False))
        parts_m.append(np.stack([
            np.frombuffer(e, dtype=np.float64)
            for e in b["emb"].to_pylist()
        ]))
        buffered += b.num_rows
        if buffered > 2 * sample_rows:
            _prune()
    if not parts_h or not sum(len(p) for p in parts_h):
        raise ValueError("empty corpus")
    _prune()
    s_h, s_id, s_m = parts_h[0], parts_id[0], parts_m[0]

    norm = _normalize(s_m)
    seed_idx = [int(np.argmin(s_id))]
    chosen = np.zeros(len(s_id), dtype=bool)
    chosen[seed_idx[0]] = True
    for _ in range(k - 1):
        # full matmul against the seed stack each round — the exact
        # float sequence of the old per-pass recursion (and of the
        # pinned numpy reference in test_kmeans), so ties break the same
        max_cos = (norm @ _normalize(s_m[seed_idx]).T).max(axis=1)
        # never re-pick a chosen row: a zero embedding has cosine 0 to
        # everything INCLUDING itself, so without this mask it would win
        # every remaining round and collapse the seed set. For ordinary
        # vectors the mask is a no-op (a chosen row's max_cos is 1.0,
        # never the argmin while any other row scores below 1.0), so
        # the ≤ sample_rows bit-parity with the pinned reference holds.
        max_cos = np.where(chosen, np.inf, max_cos)
        nxt = int(np.lexsort((s_id, max_cos))[0])
        seed_idx.append(nxt)
        chosen[nxt] = True
    # k > sample size: once every sample row is chosen, max_cos is
    # all-inf and the lexsort tie-break re-picks the MIN-ID row each
    # remaining round (duplicate seeds → those clusters stay empty
    # through Lloyd's counts==0 guard)
    return s_m[seed_idx].copy()


def kmeans_fit(
    ds: Dataset, n_clusters: int, iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id", emb_col: str = "embedding",
    seed_sample_rows: int = SEED_SAMPLE_ROWS,
) -> np.ndarray:
    """Lloyd's over the FULL corpus; returns (n_clusters, dim) float64
    centroids. Cosine assignment (normalized dot), mean update."""
    configure_data_context()
    cents = _farthest_point_seeds(
        ds, n_clusters, id_col, emb_col, seed_sample_rows
    )

    for _ in range(iters):
        c_ref = ray.put(_normalize(cents))

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _batch_matrix(batch, emb_col)
            assign = np.argmax(_normalize(m) @ c.T, axis=1)
            rows_c, rows_n, rows_s = [], [], []
            for j in np.unique(assign):
                members = m[assign == j]
                rows_c.append(int(j))
                rows_n.append(members.shape[0])
                rows_s.append(members.sum(axis=0).tobytes())
            return pa.table(
                {
                    "cluster": pa.array(rows_c, pa.int32()),
                    "n": pa.array(rows_n, pa.int64()),
                    "s": pa.array(rows_s, pa.binary()),
                }
            )

        # k rows per block — bounded driver fold, no shuffle at all
        sums = np.zeros_like(cents)
        counts = np.zeros(n_clusters, dtype=np.int64)
        for b in ds.map_batches(
            partials, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for j, n, s in zip(b["cluster"].to_pylist(),
                               b["n"].to_pylist(), b["s"].to_pylist()):
                sums[j] += np.frombuffer(s, dtype=np.float64)
                counts[j] += n
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cents


def assign_clusters(
    ds: Dataset, centroids: np.ndarray, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Append a ``cluster`` column: nearest centroid by cosine."""
    c_ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, emb_col))
        cluster = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cluster, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")


def semdedup_pairs(
    ds: Dataset, eps: float, n_clusters: int, iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id", emb_col: str = "embedding",
    num_partitions: int = 4, max_cluster_rows: int = MAX_CLUSTER_ROWS,
    seed_sample_rows: int = SEED_SAMPLE_ROWS,
) -> tuple[Dataset, Dataset]:
    """(pairs, skipped): within-cluster cosine ≥ eps candidate pairs
    (id_a < id_b) and a (cluster, n_rows) table of clusters skipped by the
    hot-cluster guard (empty when nothing was dropped)."""
    configure_data_context()
    cents = kmeans_fit(
        ds, n_clusters, iters, id_col, emb_col, seed_sample_rows
    )
    assigned = assign_clusters(ds, cents, id_col, emb_col)
    by_cluster = assigned.select_columns(
        [id_col, emb_col, "cluster"]
    ).repartition(num_blocks=min(num_partitions, n_clusters),
                  keys=["cluster"])

    def pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        skip_c, skip_n = [], []
        if batch.num_rows:
            clusters = np.asarray(batch["cluster"].to_pylist())
            ids_all = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m_all = _normalize(_batch_matrix(batch, emb_col))
            for cl in np.unique(clusters):
                sel = clusters == cl
                if int(sel.sum()) > max_cluster_rows:
                    skip_c.append(int(cl))
                    skip_n.append(int(sel.sum()))
                    continue
                ids = ids_all[sel]
                order = np.argsort(ids)
                ids = ids[order]
                m = m_all[sel][order]
                # shared row-chunked scan (embed.chunked_upper_pairs):
                # bounds transients at chunk×m instead of the one-shot
                # m² sims + triu index arrays (≈1.2 GB at m≈8k —
                # measured as the dominant semdedup wall at sf1)
                a, b, s = chunked_upper_pairs(m, ids, eps)
                out_a.extend(a)
                out_b.extend(b)
                out_s.extend(s)
        # pair rows and skip-marker rows share one table (id_a NULL marks
        # a skip row) so the stage emits a single stable schema
        n_pairs, n_skip = len(out_a), len(skip_c)
        return pa.table(
            {
                "id_a": pa.array(out_a + [None] * n_skip, pa.int64()),
                "id_b": pa.array(out_b + [None] * n_skip, pa.int64()),
                "sim": pa.array(out_s + [None] * n_skip, pa.float64()),
                "_skip_c": pa.array([None] * n_pairs + skip_c, pa.int32()),
                "_skip_n": pa.array([None] * n_pairs + skip_n, pa.int64()),
            }
        )

    raw = by_cluster.map_batches(pairs, batch_format="pyarrow",
                                 batch_size=None).materialize()
    import pyarrow.compute as pc

    pair_ds = raw.map_batches(
        lambda t: t.filter(pc.is_valid(t["id_a"]))
        .select(["id_a", "id_b", "sim"]),
        batch_format="pyarrow",
    )
    skipped = raw.map_batches(
        lambda t: pa.table(
            {"cluster": t.filter(pc.is_valid(t["_skip_c"]))["_skip_c"],
             "n_rows": t.filter(pc.is_valid(t["_skip_c"]))["_skip_n"]}
        ),
        batch_format="pyarrow",
    )
    return pair_ds, skipped


def semdedup(
    ds: Dataset, eps: float, n_clusters: int, iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id", emb_col: str = "embedding",
    num_partitions: int = 4, max_cluster_rows: int = MAX_CLUSTER_ROWS,
    seed_sample_rows: int = SEED_SAMPLE_ROWS,
) -> tuple[Dataset, Dataset]:
    """(kept, skipped): drop all but the min-id member of every semantic
    duplicate group (cosine ≥ eps within a k-means cluster)."""
    from .graph import connected_components, drop_by_components

    pair_ds, skipped = semdedup_pairs(
        ds, eps, n_clusters, iters, id_col, emb_col, num_partitions,
        max_cluster_rows, seed_sample_rows,
    )
    comps = connected_components(
        pair_ds.select_columns(["id_a", "id_b"]), num_partitions=num_partitions
    )
    kept = drop_by_components(ds, comps, id_col, num_partitions)
    return kept, skipped
