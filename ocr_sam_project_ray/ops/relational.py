"""Relational / windowed capability pipelines over the TPC-H-ish test
tables — each demonstrates one scale pattern from SURVEY.md §2.4-2.6 and is
verified against a DuckDB oracle:

- q1_pricing_summary: filter + partial-aggregate-then-groupby (the combiner
  pattern; money in integer CENTS so sums hash exactly)
- q3_top_orders:      broadcast semi-join chain (small side via ray.put)
  + grouped sum + deterministic top-k
- nation_counts_join: the built-in hash ``Dataset.join`` (both sides as
  datasets) for when neither side is broadcastable
- top_events:         global sort + limit with unique tie-break
- events_hourly:      tumbling event-time window as integer window ids
  (partial per batch → groupby (user, window))
- user_sessions:      30-min-gap sessionization via groupby(user).map_groups
  over ts-sorted groups (the ordered-log pattern)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..context import configure_data_context

CUTOFF_DATE = "1995-03-15"
SEGMENT = "BUILDING"
SESSION_GAP_US = 30 * 60 * 1_000_000
HOUR_US = 3_600_000_000


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """double dollars → exact int64 cents (same expression as the oracle:
    CAST(round(x*100) AS BIGINT)) so distributed sums are order-independent.
    round_mode 'half_towards_infinity' (= half away from zero) matches
    DuckDB's round(); pyarrow's half-to-even default differs on exact .5 cents."""
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def np_cents(values) -> "np.ndarray":
    """numpy twin of _cents for pandas map_groups kernels: double dollars
    → int64 cents, half away from zero on BOTH signs — EXACT DuckDB
    round() / pc.round(half_towards_infinity) semantics via the shared
    kernel (the old floor(x+0.5) trick rounded UP at
    scaled = nextafter(n+0.5, 0), diverging from both twins)."""
    import numpy as np

    from .quantize import np_round_half_away

    return np_round_half_away(
        np.asarray(values, dtype=np.float64) * 100.0
    ).astype("int64")


def q1_pricing_summary(sf_dir: str, num_partitions: int = 4):
    """Pricing summary (TPC-H Q1 shape): per (returnflag, linestatus) counts
    and cent-exact sums, pre-aggregated inside map_batches."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64(CUTOFF_DATE, "us")))
        )
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(
                    pc.round(batch["l_quantity"], round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
                "base_cents": _cents(batch["l_extendedprice"]),
                "disc_cents": _cents(disc_price),
            }
        )
        # Arrow-native combiner: zero-copy in, no pandas round-trip
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("disc_cents", "sum"),
             ([], "count_all")]
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "base_cents", "disc_cents", "n"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=num_partitions)
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Sum("n", alias_name="count_order"),
        )
    )
    return out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(sf_dir: str, k: int = 10, num_partitions: int = 4):
    """Shipping-priority top-k (TPC-H Q3 shape) with NO unbounded driver
    state: the customer side (a filtered dimension projection) is broadcast
    once and probed with a vectorized ``pc.is_in``; the qualifying-order
    side stays a Dataset and semi-joins lineitem with the native hash
    ``Dataset.join`` (left_semi) — at any scale the order set never lands
    on the driver. Per-block Arrow combiners shrink the grouped sum, and
    the final top-k is a distributed sort + limit."""
    configure_data_context()
    cutoff = pa.scalar(np.datetime64(CUTOFF_DATE, "us"))

    # customer is the smallest relation: filter distributed, broadcast only
    # the qualifying keys (one int64 array) for a vectorized probe
    parts = [
        b["c_custkey"].combine_chunks()
        for b in ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        .map_batches(
            lambda b: b.filter(pc.equal(b["c_mktsegment"], SEGMENT)).select(
                ["c_custkey"]
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ]
    cust_keys = pa.concat_arrays(parts) if parts else pa.array([], pa.int64())
    ck_ref = ray.put(cust_keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def filt_orders(batch: pa.Table) -> pa.Table:
        keys = ray.get(ck_ref)
        batch = batch.filter(pc.less(batch["o_orderdate"], cutoff))
        return batch.filter(pc.is_in(batch["o_custkey"], value_set=keys)).select(
            ["o_orderkey"]
        )

    # compact away empty blocks: the join shuffle drops empty blocks before
    # its schema broadcast, which can break sparse partitions downstream
    okeys_ds = orders.map_batches(filt_orders, batch_format="pyarrow").materialize()
    n_okeys = okeys_ds.count()
    if n_okeys == 0:
        import pandas as pd

        return pd.DataFrame({"l_orderkey": pd.array([], dtype="int64"),
                             "revenue_cents": pd.array([], dtype="int64")})
    okeys_ds = okeys_ds.repartition(num_blocks=min(num_partitions, n_okeys))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b["l_shipdate"], cutoff)),
        batch_format="pyarrow",
    )

    joined = li.join(
        okeys_ds,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "revenue_cents": rev})
        agg = t.group_by("l_orderkey").aggregate([("revenue_cents", "sum")])
        return agg.rename_columns(["l_orderkey", "revenue_cents"])

    from ray.data.aggregate import Sum

    grouped = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey", num_partitions=num_partitions)
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    top = grouped.sort(
        ["revenue_cents", "l_orderkey"], descending=[True, False]
    ).limit(k)
    return top.to_pandas().reset_index(drop=True)


SQL_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}' AND o_orderdate < TIMESTAMP '{cutoff}'
  AND l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY l_orderkey
ORDER BY revenue_cents DESC, l_orderkey
LIMIT {k}
"""


def nation_counts_join(sf_dir: str, num_partitions: int = 4):
    """customer ⋈ nation via the built-in hash Dataset.join, then grouped
    count per nation name (demonstrates the native join operator)."""
    configure_data_context()
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    joined = cust.join(
        nation,
        join_type="inner",
        num_partitions=num_partitions,
        on=("c_nationkey",),
        right_on=("n_nationkey",),
    )
    from ray.data.aggregate import Count

    out = joined.groupby("n_name", num_partitions=num_partitions).aggregate(
        Count(alias_name="n_customers")
    )
    return out.to_pandas().sort_values("n_name").reset_index(drop=True)


SQL_NATION_COUNTS = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def top_events(sf_dir: str, k: int = 20):
    """Global top-k events by value (sort + limit, unique tie-break)."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    out = ds.sort(["value", "event_id"], descending=[True, False]).limit(k)
    return out.to_pandas().reset_index(drop=True)


SQL_TOP_EVENTS = """
SELECT event_id, user_id, value FROM events
ORDER BY value DESC, event_id LIMIT {k}
"""


def events_hourly(sf_dir: str, num_partitions: int = 4):
    """Tumbling 1-hour event-time window per user: integer window id =
    epoch_us // 3600e6; partial counts/sums per batch then a small groupby."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.divide(pc.cast(batch["ts"], pa.int64()), HOUR_US)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_id": pc.cast(win, pa.int64()),
                "value_cents": _cents(batch["value"]),
            }
        )
        agg = t.group_by(["user_id", "window_id"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        return agg.rename_columns(
            ["user_id", "window_id", "n_events", "value_cents"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_id"], num_partitions=num_partitions)
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )
    return out.to_pandas().sort_values(["user_id", "window_id"]).reset_index(drop=True)


SQL_EVENTS_HOURLY = """
SELECT user_id, epoch_us(ts) // 3600000000 AS window_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id, window_id ORDER BY user_id, window_id
"""


def user_sessions(sf_dir: str, num_partitions: int = 4,
                  max_group_rows=None, cap_stats=None):
    """Sessionization (30-min gap) per user via groupby(user).map_groups over
    ts-sorted groups — the ordered-log / streaming-window pattern. Ordering
    assumption: sorting happens INSIDE each group, so no global order needed;
    ``max_group_rows`` + ``cap_stats`` (ops/guards.py) turn a hot user that
    would OOM the group into a counted record-and-skip instead."""
    from .segmented import filter_overflow_segments, sorted_segments

    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    empty = pa.table(
        {"user_id": pa.array([], pa.int64()),
         "n_sessions": pa.array([], pa.int64()),
         "n_events": pa.array([], pa.int64())}
    )

    def sessions(batch: pa.Table) -> pa.Table:
        # Arrow-native segmented kernel (round 4): all users of the
        # partition in one pass — session starts are gap>threshold OR
        # segment boundary; per-user counts via one add.reduceat
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch, [("user_id", "ascending"), ("ts", "ascending")]
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        n = s.num_rows
        if n == 0:
            return empty
        ts = pc.cast(s["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = SESSION_GAP_US + 1
        if n > 1:
            gap[1:] = ts[1:] - ts[:-1]
        gap[starts] = SESSION_GAP_US + 1  # first event per user
        new_session = (gap > SESSION_GAP_US).astype(np.int64)
        n_sessions = np.add.reduceat(new_session, starts)
        return pa.table(
            {
                "user_id": s["user_id"].take(pa.array(starts, pa.int64())),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    # Dataset out (one row per user): stream on; pandas only in wrappers
    return ds.repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(sessions, batch_format="pyarrow", batch_size=None)


SQL_USER_SESSIONS = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > {gap} OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, CAST(count(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id ORDER BY user_id
"""


def events_asof_orders(sf_dir: str, num_partitions: int = 4,
                       max_group_rows=None, cap_stats=None):
    """As-of join (custom operator — Ray Data has no native as-of):
    each event joins the LATEST order of the same user with
    o_orderdate <= ts. Implementation: tag + union both sides, hash-group
    by the key, and run pandas merge_asof inside map_groups over the
    ts-sorted group — the documented partitioning assumption is that one
    key's rows fit one group; ``max_group_rows`` + ``cap_stats``
    (ops/guards.py) make a hot key a counted record-and-skip, not an OOM.
    Orders are pre-deduplicated to one per (custkey, orderdate) (max
    orderkey) so ties are deterministic. Oracle: DuckDB ASOF LEFT JOIN."""
    configure_data_context()
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def tag_events(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["user_id"],
                "ts": pc.cast(batch["ts"], pa.int64()),
                "event_id": batch["event_id"],
                "orderkey": pa.array([-1] * len(batch), pa.int64()),
                "role": pa.array(["e"] * len(batch), pa.string()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["o_custkey"],
                "ts": pc.cast(batch["o_orderdate"], pa.int64()),
                "event_id": pa.array([-1] * len(batch), pa.int64()),
                "orderkey": batch["o_orderkey"],
                "role": pa.array(["o"] * len(batch), pa.string()),
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    from .segmented import filter_overflow_segments, sorted_segments

    empty = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "last_orderkey": pa.array([], pa.int64())}
    )

    def asof_local(batch: pa.Table) -> pa.Table:
        """Arrow-native segmented as-of (round 4): one composite-rank
        searchsorted over ALL keys of the partition (the attribution
        idiom). The (ts, orderkey) sort puts the max orderkey last
        within a date, so 'rightmost order with ts <= event ts' IS the
        oracle's QUALIFY max-orderkey-per-date + backward as-of."""
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch,
            [("key", "ascending"), ("ts", "ascending"),
             ("orderkey", "ascending")],
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        if s.num_rows == 0:
            return empty
        is_order = pc.equal(s["role"], "o").to_numpy(zero_copy_only=False)
        if not (~is_order).any():
            return empty
        ts = s["ts"].to_numpy(zero_copy_only=False)
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        _, rank = np.unique(ts, return_inverse=True)
        comp = seg_id * (len(ts) + 1) + rank
        o_comp = comp[is_order]
        o_seg = seg_id[is_order]
        o_key = s["orderkey"].to_numpy(zero_copy_only=False)[is_order]
        e_comp = comp[~is_order]
        e_seg = seg_id[~is_order]
        ev = s.filter(pa.array(~is_order))
        if len(o_comp) == 0:
            last = np.full(len(e_comp), -1, dtype=np.int64)
        else:
            idx = np.searchsorted(o_comp, e_comp, side="right") - 1
            safe = np.maximum(idx, 0)
            valid = (idx >= 0) & (o_seg[safe] == e_seg)
            last = np.where(valid, o_key[safe], -1)
        return pa.table(
            {
                "event_id": ev["event_id"],
                "user_id": ev["key"],
                "last_orderkey": pa.array(last, pa.int64()),
            }
        )

    # Dataset out (one row per EVENT — unbounded): stream on via
    # write_parquet/iter_batches; pandas only in the bounded wrappers
    return both.repartition(
        num_blocks=num_partitions, keys=["key"]
    ).map_batches(asof_local, batch_format="pyarrow", batch_size=None)


SQL_EVENTS_ASOF = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id,
       COALESCE(o.o_orderkey, -1) AS last_orderkey
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


def distinct_event_types(sf_dir: str):
    """Distinct values via Dataset.unique (a shuffle-backed set op)."""
    import pandas as pd

    configure_data_context()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    values = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": values})


SQL_DISTINCT_EVENT_TYPES = """
SELECT DISTINCT event_type FROM events ORDER BY event_type
"""


def events_stats_by_type(sf_dir: str, num_partitions: int = 4):
    """Per-type count / exact min / exact max / cent-sum — Min and Max
    select existing doubles, so they hash exactly; mean is intentionally
    excluded (float accumulation is order-dependent)."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "value": batch["value"],
                "cents": _cents(batch["value"]),
            }
        )
        agg = t.group_by("event_type").aggregate(
            [([], "count_all"), ("value", "min"), ("value", "max"),
             ("cents", "sum")]
        )
        return agg.rename_columns(["event_type", "n", "vmin", "vmax", "cents"])

    from ray.data.aggregate import Max, Min, Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=num_partitions)
        .aggregate(
            Sum("n", alias_name="n"),
            Min("vmin", alias_name="min_value"),
            Max("vmax", alias_name="max_value"),
            Sum("cents", alias_name="value_cents"),
        )
    )
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_STATS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type ORDER BY event_type
"""


def suppliers_by_region(sf_dir: str):
    """Two-level broadcast join over dimension tables: supplier ⋈ nation ⋈
    region → supplier count + cent-exact balance sum per region. Both
    lookup sides are tiny → dict broadcast inside one map_batches (the
    dimension-join pattern; no shuffle)."""
    configure_data_context()
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    # pre-compose nation → region-name as two parallel arrays so the probe
    # inside map_batches is a single vectorized index_in + take
    region_name = dict(zip(region.r_regionkey, region.r_name))
    nation_keys = pa.array(nation.n_nationkey.tolist(), pa.int64())
    nation_rname = pa.array(
        [region_name[rk] for rk in nation.n_regionkey], pa.string()
    )
    lookup_ref = ray.put((nation_keys, nation_rname))

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        keys, rnames = ray.get(lookup_ref)
        idx = pc.index_in(batch["s_nationkey"], value_set=keys)
        t = pa.table(
            {
                "r_name": pc.take(rnames, idx),
                "acctbal_cents": _cents(batch["s_acctbal"]),
            }
        )
        agg = t.group_by("r_name").aggregate(
            [([], "count_all"), ("acctbal_cents", "sum")]
        )
        return agg.rename_columns(["r_name", "n_suppliers", "acctbal_cents"])

    from ray.data.aggregate import Sum

    out = (
        sup.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name", num_partitions=2)
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
    )
    return out.to_pandas().sort_values("r_name").reset_index(drop=True)


SQL_SUPPLIERS_BY_REGION = """
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def events_json_k(sf_dir: str, num_partitions: int = 2):
    """JSON scalar extraction over the events ``props`` column (tolerant
    parse — the reference's maybe-string-maybe-dict handling,
    ocr_processor/app.py:346-357): per event_type, count + sum of the
    JSON field ``k``. Oracle: DuckDB json_extract."""
    import json as _json

    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch["props"].to_pylist():
            try:
                obj = _json.loads(p) if isinstance(p, str) else (p or {})
                k = obj.get("k", 0) if isinstance(obj, dict) else 0
                ks.append(int(k))
            except (ValueError, TypeError):
                ks.append(0)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "k": pa.array(ks, pa.int64()),
            }
        )
        agg = t.group_by("event_type").aggregate([([], "count_all"), ("k", "sum")])
        return agg.rename_columns(["event_type", "n", "k_sum"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"), Sum("k_sum", alias_name="k_sum"))
    )
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_JSON_K = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS k_sum
FROM events GROUP BY event_type ORDER BY event_type
"""


def top_events_per_user(sf_dir: str, k: int = 3, num_partitions: int = 4):
    """Grouped top-k (distinct from global top-k): top-k events per user by
    value. Partial top-k per batch inside map_batches (each batch emits at
    most k rows per user it saw) → groupby(user).map_groups final top-k —
    the shuffle only ever moves candidate rows, never the full table.
    Deterministic tie-break on event_id."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_pylist(),
                "event_id": batch["event_id"].to_pylist(),
                "value": batch["value"].to_pylist(),
            }
        )
        df = df.sort_values(["user_id", "value", "event_id"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).head(k), preserve_index=False
        )

    def final(g):
        g = g.sort_values(["value", "event_id"], ascending=[False, True])
        return g.head(k)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=num_partitions)
        .map_groups(final, batch_format="pandas")
    )
    return (
        out.to_pandas()
        .sort_values(["user_id", "value", "event_id"], ascending=[True, False, True])
        .reset_index(drop=True)[["user_id", "event_id", "value"]]
    )


SQL_TOP_EVENTS_PER_USER = """
SELECT user_id, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) <= {k}
ORDER BY user_id, value DESC, event_id
"""


VALUE_BANDS = [
    # (band_id, lo, hi) — half-open [lo, hi); the broadcast range-join side
    (1, 0.0, 100.0),
    (2, 100.0, 500.0),
    (3, 500.0, 2000.0),
    (4, 2000.0, 10**9),
]


def events_range_join(sf_dir: str, num_partitions: int = 2):
    """RANGE JOIN (custom operator — Ray Data has no native banded join):
    each event joins the band whose [lo, hi) interval contains its value.
    The band table is tiny and SORTED, so the join is a broadcast +
    vectorized ``np.searchsorted`` per batch — no shuffle at all; the
    general pattern for joining a stream against interval dimension
    tables (rate cards, SLA tiers, bucket schedules). Returns per-band
    counts + cent-exact sums. Oracle: SQL BETWEEN join."""
    configure_data_context()
    bands = sorted(VALUE_BANDS, key=lambda b: b[1])
    lows = np.array([b[1] for b in bands])
    his = np.array([b[2] for b in bands])
    ids = np.array([b[0] for b in bands], dtype=np.int64)
    bands_ref = ray.put((lows, his, ids))

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        lo, hi, bid = ray.get(bands_ref)
        vals = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo, vals, side="right") - 1
        # per-band containment, not just the global envelope: idx >= 0
        # guarantees vals >= lo[idx]; also require vals < hi[idx] so values
        # in a GAP between non-contiguous bands fall OUT of the join (SQL
        # BETWEEN semantics) instead of silently landing in the band below
        keep = (idx >= 0) & (vals < hi[np.clip(idx, 0, len(hi) - 1)])
        batch = batch.filter(pa.array(keep))
        idx = idx[keep]
        t = pa.table(
            {
                "band_id": pa.array(bid[idx], pa.int64()),
                "value_cents": _cents(batch["value"]),
            }
        )
        agg = t.group_by("band_id").aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        return agg.rename_columns(["band_id", "n_events", "value_cents"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("band_id", num_partitions=num_partitions)
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )
    return out.to_pandas().sort_values("band_id").reset_index(drop=True)


def _bands_sql_values() -> str:
    return ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in VALUE_BANDS)


SQL_EVENTS_RANGE_JOIN = """
WITH bands(band_id, lo, hi) AS (VALUES {bands})
SELECT band_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id ORDER BY band_id
"""


def events_hopping(sf_dir: str, num_partitions: int = 4):
    """HOPPING (overlapping) window aggregate: 2-hour windows advancing
    every hour — each event belongs to TWO windows, so the window
    assignment is a flat-map (one row per (event, window)) followed by the
    standard partial-then-final aggregation. The overlap factor is the
    fan-out cost, stated explicitly; window ids are integers
    (epoch_us // hop), never timestamps, so grouping is exact."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        base = pc.cast(
            pc.divide(pc.cast(batch["ts"], pa.int64()), HOUR_US), pa.int64()
        ).combine_chunks()
        cents = _cents(batch["value"]).combine_chunks()
        users = batch["user_id"].combine_chunks()
        # windows [w-1, w] both contain an event in hour-slot w (size 2h, hop 1h)
        win = pa.concat_arrays([base, pc.subtract(base, 1)])
        t = pa.table(
            {
                "user_id": pa.concat_arrays([users, users]),
                "window_id": win,
                "value_cents": pa.concat_arrays([cents, cents]),
            }
        )
        agg = t.group_by(["user_id", "window_id"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        return agg.rename_columns(
            ["user_id", "window_id", "n_events", "value_cents"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_id"], num_partitions=num_partitions)
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )
    return out.to_pandas().sort_values(["user_id", "window_id"]).reset_index(drop=True)


SQL_EVENTS_HOPPING = """
WITH w AS (
  SELECT user_id,
         unnest([epoch_us(ts) // 3600000000,
                 epoch_us(ts) // 3600000000 - 1]) AS window_id,
         CAST(round(value*100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, window_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM w GROUP BY user_id, window_id ORDER BY user_id, window_id
"""
