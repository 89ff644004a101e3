"""Relational analytics registry entries (SURVEY §2.4): aggregates,
top-k, joins, windows — the non-KG half of the driver board. Builders +
their DuckDB oracle SQL twins; assembled in ``pipelines.queries``."""

from __future__ import annotations

import pyarrow.parquet as pq
import ray.data as rd

from ..stages.groupagg import grouped_aggregate, top_k
from .queries_kg import _read

# ---------------------------------------------------------------------------
# relational operators


def q_q1_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-style grouped aggregate (partial-agg combiner + hash
    shuffle). Aggregates chosen exact-reproducible (integral sums)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return grouped_aggregate(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "count_order": ("l_quantity", "count"),
        },
        num_partitions=8,
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       avg(l_quantity) AS avg_qty,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top10_orders(sf_dir: str) -> rd.Dataset:
    """Global top-k without full sort (per-block prune + tiny merge)."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return top_k(
        o, ["o_totalprice", "o_orderkey"], k=10, descending=[True, False]
    )


SQL_TOP10_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_shipping_priority(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q3-shaped composition: segment-filtered customers SEMI-join
    orders, date-filtered lineitem INNER-joins the surviving orders
    (both via `engine.joins.hash_join` — one co-hash shuffle each),
    grouped revenue, then distributed top-10. Revenue is computed in
    EXACT integer 1e-4 currency units (price and discount are
    centi-integral), so the sum is order-independent and the driver
    hash is deterministic — the float-sum form would depend on
    reduction order."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..engine.joins import hash_join

    CUT = pa.scalar(_dt.datetime(1998, 1, 1), pa.timestamp("us"))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"), CUT)),
        batch_format="pyarrow",
    )
    building_orders = hash_join(
        orders, cust, ["o_custkey"], ["c_custkey"],
        num_partitions=8, join_type="left semi",
    ).drop_columns(["o_custkey"])

    def li_rev(t: pa.Table) -> pa.Table:
        s = t.filter(pc.greater(t.column("l_shipdate"), CUT))
        price_c = pc.round(pc.multiply(s.column("l_extendedprice"), 100.0))
        disc_c = pc.round(pc.multiply(s.column("l_discount"), 100.0))
        rev = pc.multiply(
            price_c.cast(pa.int64()),
            pc.subtract(pa.scalar(100, pa.int64()), disc_c.cast(pa.int64())),
        )
        return pa.table(
            {"l_orderkey": s.column("l_orderkey"), "rev_e4": rev}
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_rev, batch_format="pyarrow")

    joined = hash_join(
        li, building_orders, ["l_orderkey"], ["o_orderkey"],
        num_partitions=8, join_type="inner",
    )
    agg = grouped_aggregate(
        joined,
        keys=["l_orderkey", "o_orderdate", "o_orderpriority"],
        aggs={"revenue_e4": ("rev_e4", "sum")},
        num_partitions=8,
    )
    return top_k(
        agg, ["revenue_e4", "l_orderkey"], k=10, descending=[True, False]
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


def q_latest_order_per_customer(sf_dir: str) -> rd.Dataset:
    """CDC-compaction shape — latest version per key (`groupagg.
    grouped_top_k` k=1: per-block prune to one row per key seen, ONE
    keyed shuffle, exact per-key head). The upsert/SCD pattern every
    incremental ingest needs."""
    from ..stages.groupagg import grouped_top_k

    o = _read(
        sf_dir, "orders",
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    return grouped_top_k(
        o, ["o_custkey"], ["o_orderdate", "o_orderkey"], k=1,
        descending=True, num_partitions=8,
    )


SQL_LATEST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
) = 1
"""


def q_throttle_events(sf_dir: str) -> rd.Dataset:
    """Windowed event dedup (retry/duplicate throttle): FIRST event per
    (user, type, hour) — tumbling-window id is row-local
    (``floor_temporal``), then one grouped_top_k(k=1) shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import grouped_top_k

    ev = _read(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]
    ).map_batches(
        lambda t: t.append_column(
            "wnd", pc.floor_temporal(t.column("ts"), unit="hour")
        ),
        batch_format="pyarrow",
    )
    return grouped_top_k(
        ev, ["user_id", "event_type", "wnd"], ["ts", "event_id"], k=1,
        descending=False, num_partitions=8,
    )


SQL_THROTTLE_EVENTS = """
SELECT event_id, user_id, event_type, ts, date_trunc('hour', ts) AS wnd
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type, date_trunc('hour', ts)
  ORDER BY ts, event_id
) = 1
"""


def q_mode_event_per_user(sf_dir: str) -> rd.Dataset:
    """Per-group MODE (each user's dominant event type): combiner-first
    grouped counts, then grouped_top_k(k=1) by (count desc, value asc)
    — the SQL ``mode()`` aggregate as two keyed shuffles, both
    combiner-pruned."""
    from ..stages.groupagg import grouped_aggregate, grouped_top_k

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = grouped_aggregate(
        ev,
        keys=["user_id", "event_type"],
        aggs={"cnt": ("event_type", "count")},
        num_partitions=8,
    )
    return grouped_top_k(
        counts, ["user_id"], ["cnt", "event_type"], k=1,
        descending=[True, False], num_partitions=8,
    )


SQL_MODE_EVENT_PER_USER = """
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY user_id, event_type
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY count(*) DESC, event_type
) = 1
"""


def q_purchase_events(sf_dir: str) -> rd.Dataset:
    """Filter + project with expression pushdown."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value", "event_type"])
    return ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "value"]
    )


SQL_PURCHASE_EVENTS = """
SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
"""


def q_brand_stats(sf_dir: str) -> rd.Dataset:
    """Broadcast join (small part side) + grouped aggregate."""
    import pyarrow as pa
    import ray

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    ref = ray.put(part)

    class Join:
        def __init__(self):
            self.part = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.join(self.part, keys=["l_partkey"], right_keys=["p_partkey"])

    joined = li.map_batches(Join, batch_format="pyarrow", concurrency=(1, 8))
    return grouped_aggregate(
        joined,
        keys=["p_brand"],
        aggs={"n_items": ("l_quantity", "count"), "sum_qty": ("l_quantity", "sum")},
        num_partitions=8,
    )


SQL_BRAND_STATS = """
SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_segment_orders(sf_dir: str) -> rd.Dataset:
    """Hash join (Ray Dataset.join) + grouped aggregate."""
    from ..engine.distinct import ensure_hash_shuffle
    from ..engine.joins import hash_join

    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ensure_hash_shuffle(o)
    joined = hash_join(o, c, ["o_custkey"], ["c_custkey"], num_partitions=8)
    return grouped_aggregate(
        joined, keys=["c_mktsegment"], aggs={"n_orders": ("o_orderkey", "count")},
        num_partitions=8,
    )


SQL_SEGMENT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_orders
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_event_trails(sf_dir: str) -> rd.Dataset:
    """GROUP_CONCAT / string_agg: each user's event-type sequence in
    time order (the behavioral-trail feature op; SPARQL GROUP_CONCAT's
    distributed shape). Column pruning is the only possible combiner —
    concatenation doesn't reduce — then ONE keyed shuffle + per-partition
    sort-and-join."""
    from ..stages.groupagg import grouped_concat

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return grouped_concat(
        ev,
        keys=["user_id"],
        col="event_type",
        sep=",",
        order_by=["ts", "event_id"],
        out="trail",
        num_partitions=8,
    )


SQL_EVENT_TRAILS = """
SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS trail
FROM events GROUP BY user_id
"""


def q_event_gaps(sf_dir: str) -> rd.Dataset:
    """LAG window function: per user, microseconds since the previous
    event (NULL for the first) — the inter-arrival feature op. One
    keyed shuffle + per-partition vectorized sort + groupby-shift
    (``stages/sessions.window_shift``). The gap divides timedeltas by
    1 µs (exact integer ratio in float64), never seconds-float
    round-trips."""
    import pandas as pd

    from ..stages.sessions import window_shift

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    sh = window_shift(
        ev,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        shifts={"prev_ts": ("ts", 1)},
        num_partitions=8,
    )

    def gap(df: pd.DataFrame) -> pd.DataFrame:
        g = (df["ts"] - df["prev_ts"]) / pd.Timedelta(microseconds=1)
        return pd.DataFrame(
            {"user_id": df["user_id"], "event_id": df["event_id"], "gap_us": g}
        )

    return sh.map_batches(gap, batch_format="pandas")


SQL_EVENT_GAPS = """
SELECT user_id, event_id,
       CAST(date_diff('microsecond',
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id),
                      ts) AS DOUBLE) AS gap_us
FROM events
"""


def q_priority_price_quantiles(sf_dir: str) -> rd.Dataset:
    """Per-group exact discrete quantiles (quantile_disc GROUP BY):
    order-price quartiles per order priority. Combiner-first value
    histogram + one tiny keyed shuffle; nothing on the driver."""
    from ..stages.groupagg import grouped_quantiles

    o = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return grouped_quantiles(
        o,
        keys=["o_orderpriority"],
        col="o_totalprice",
        qs=[0.25, 0.5, 0.75],
        num_partitions=8,
    )


SQL_PRIORITY_PRICE_QUANTILES = """
SELECT o_orderpriority,
       UNNEST(CAST([0.25, 0.5, 0.75] AS DOUBLE[])) AS q,
       UNNEST(quantile_disc(o_totalprice, [0.25, 0.5, 0.75])) AS value
FROM orders GROUP BY o_orderpriority
"""


def q_rollup_orders(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP: order counts per (priority, status), per
    priority, and grand total — the raw data aggregates ONCE, coarser
    levels re-aggregate the finer (tiny) result."""
    from ..stages.groupagg import rollup_aggregate

    o = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return rollup_aggregate(
        o,
        keys=["o_orderpriority", "o_orderstatus"],
        aggs={"n_orders": ("o_orderstatus", "count")},
        num_partitions=8,
    )


SQL_ROLLUP_ORDERS = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(o_orderstatus) AS BIGINT) AS n_orders
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_top_orders_per_priority(sf_dir: str) -> rd.Dataset:
    """Top-k rows PER GROUP: the 3 priciest orders per order priority
    (per-block combiner prune -> one keyed shuffle -> exact per-key
    prune); o_orderkey tiebreak makes the page deterministic."""
    from ..stages.groupagg import grouped_top_k

    o = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"]
    )
    return grouped_top_k(
        o,
        keys=["o_orderpriority"],
        sort_cols=["o_totalprice", "o_orderkey"],
        k=3,
        descending=[True, False],
        num_partitions=8,
    )


SQL_TOP_ORDERS_PER_PRIORITY = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) t WHERE rnk <= 3
"""


def q_profile_orders(sf_dir: str):
    """Single-pass column profile (catalog statistics): count / nulls /
    min / max per numeric column, one tiny partial row per block per
    column, no shuffle — the stats pass a planner runs before touching
    the data."""
    from ..stages.profile import profile_columns

    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return profile_columns(o)


SQL_PROFILE_ORDERS = """
SELECT 'o_custkey' AS "column", CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(o_custkey) AS BIGINT) AS nulls,
       CAST(min(o_custkey) AS DOUBLE) AS min_v,
       CAST(max(o_custkey) AS DOUBLE) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderkey) AS BIGINT),
       CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
FROM orders
"""


def q_distinct_event_types(sf_dir: str) -> rd.Dataset:
    from ..engine.distinct import distinct_rows

    ev = _read(sf_dir, "events", ["event_type"])
    return distinct_rows(ev, ["event_type"], num_buckets=4)


SQL_DISTINCT_EVENT_TYPES = "SELECT DISTINCT event_type FROM events"




def q_rolling_minmax_events(sf_dir: str) -> rd.Dataset:
    """Sliding 3-row window min/max/count per user event stream
    (SQL ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — exact window fns
    only (min/max/count; float sums would ulp-diverge from a re-summing
    SQL engine, see ``stages/windows.rolling_aggregate``)."""
    from ..stages.windows import rolling_aggregate

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return rolling_aggregate(
        ev,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        aggs={
            "mv_min": ("value", "min", 3),
            "mv_max": ("value", "max", 3),
            "mv_cnt": ("value", "count", 3),
        },
        num_partitions=16,
    )


SQL_ROLLING_MINMAX_EVENTS = """
SELECT event_id, ts, user_id, value,
       min(value)   OVER w AS mv_min,
       max(value)   OVER w AS mv_max,
       count(value) OVER w AS mv_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_rank_orders_date(sf_dir: str) -> rd.Dataset:
    """rank / dense_rank / percent_rank per priority by order date —
    ties are frequent (day-granular dates), so the entry exercises the
    peer-run semantics; all three fns are tie-stable (equal inputs get
    equal outputs), keeping the row set deterministic."""
    from ..stages.windows import grouped_rank

    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])
    return grouped_rank(
        o,
        keys=["o_orderpriority"],
        order_by=["o_orderdate"],
        ranks={
            "rk": ("rank", None),
            "drk": ("dense_rank", None),
            "prk": ("percent_rank", None),
        },
        num_partitions=16,
    )


SQL_RANK_ORDERS_DATE = """
SELECT o_orderkey, o_orderpriority, o_orderdate,
       rank()         OVER w AS rk,
       dense_rank()   OVER w AS drk,
       percent_rank() OVER w AS prk
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
"""


def q_cube_orders(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE over (status, priority): 4 aggregation levels, the
    finest computed once from the raw data, every subset re-aggregated
    from it (count→sum / max→max monoids)."""
    from ..stages.groupagg import cube_aggregate

    o = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )
    return cube_aggregate(
        o,
        keys=["o_orderstatus", "o_orderpriority"],
        aggs={
            "n_orders": ("o_totalprice", "count"),
            "max_price": ("o_totalprice", "max"),
        },
        num_partitions=8,
    )


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, max(o_totalprice) AS max_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_pivot_events(sf_dir: str) -> rd.Dataset:
    """Static PIVOT-by-count: per-user event-type count columns
    (schema declared by the value list — stable across shards) plus an
    all-rows total."""
    from ..stages.groupagg import pivot_counts

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(
        ev,
        keys=["user_id"],
        col="event_type",
        values=["click", "error", "purchase", "signup", "view"],
        total="n_total",
        num_partitions=16,
    )


SQL_PIVOT_EVENTS = """
SELECT user_id,
 CAST(sum(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
 CAST(sum(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
 CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
 CAST(sum(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
 CAST(sum(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
 count(*) AS n_total
FROM events GROUP BY user_id
"""


def q_semi_join_customers(sf_dir: str) -> rd.Dataset:
    """LEFT SEMI hash join: customers with at least one order. The
    order side per-block dedups its key before the union-tag shuffle
    (the semi-join combiner: a customer with K orders ships ≤ blocks
    rows, not K)."""
    import pyarrow as pa

    from ..engine.joins import hash_join

    c = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    o = _read(sf_dir, "orders", ["o_custkey"])

    def uniq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"o_custkey": pc.unique(t.column("o_custkey"))})

    o = o.map_batches(uniq, batch_format="pyarrow")
    return hash_join(
        c, o, ["c_custkey"], ["o_custkey"],
        num_partitions=8, join_type="left semi",
    )


SQL_SEMI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_full_outer_segments(sf_dir: str) -> rd.Dataset:
    """FULL OUTER hash join + grouped aggregate: order counts per market
    segment INCLUDING segments whose customers placed no orders (the
    right-only rows a left join would drop)."""
    from ..engine.joins import hash_join
    from ..stages.groupagg import grouped_aggregate

    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = hash_join(
        o, c, ["o_custkey"], ["c_custkey"],
        num_partitions=8, join_type="full outer",
    )
    return grouped_aggregate(
        j,
        keys=["c_mktsegment"],
        aggs={
            "n_orders": ("o_orderkey", "count"),
            "n_rows": ("c_mktsegment", "count"),
        },
        num_partitions=4,
    )


SQL_FULL_OUTER_SEGMENTS = """
SELECT c_mktsegment,
       count(o_orderkey) AS n_orders,
       count(c_mktsegment) AS n_rows
FROM orders FULL JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_monthly_orders(sf_dir: str) -> rd.Dataset:
    """Temporal rollup: orders per calendar month (vectorized
    floor_temporal + combiner-first grouped aggregate) — the
    time-bucketed variant of the tumbling window, keyed on a derived
    column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import grouped_aggregate

    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def month(t: pa.Table) -> pa.Table:
        return t.append_column(
            "o_month", pc.floor_temporal(t.column("o_orderdate"), unit="month")
        )

    return grouped_aggregate(
        o.map_batches(month, batch_format="pyarrow"),
        keys=["o_month"],
        aggs={
            "n_orders": ("o_orderkey", "count"),
            "max_price": ("o_totalprice", "max"),
        },
        num_partitions=8,
    )


SQL_MONTHLY_ORDERS = """
SELECT date_trunc('month', o_orderdate) AS o_month,
       count(*) AS n_orders, max(o_totalprice) AS max_price
FROM orders GROUP BY 1
"""


def q_histogram_events(sf_dir: str) -> rd.Dataset:
    """Fixed-width histogram of event values (bin = floor(value/50), one
    IEEE divide + floor — bit-identical to the SQL twin) — the
    distribution profile pass that sizes quantile sketches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import grouped_aggregate

    ev = _read(sf_dir, "events", ["value"])

    def binned(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.floor(pc.divide(t.column("value"), pa.scalar(50.0))), pa.int64()
        )
        return t.append_column("bin", b)

    return grouped_aggregate(
        ev.map_batches(binned, batch_format="pyarrow"),
        keys=["bin"],
        aggs={"n": ("value", "count")},
        num_partitions=4,
    )


SQL_HISTOGRAM_EVENTS = """
SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n
FROM events GROUP BY 1
"""
