"""Registry of driver-facing queries and their DuckDB oracle SQL.

Each entry: name → (callable(sf_dir) -> Dataset/Table/DataFrame,
oracle_sql | None). Column names and types match between the Ray result
and the oracle exactly (the driver compare sorts columns by name and
hashes values). Monetary sums are integer cents (float sum order is
engine-dependent); all ints are int64.

Registered via ``@query("name", ORACLE_SQL)`` decorator; `__ray_entry__`
exposes the dicts to the driver, tests iterate all pairs at sf0.001.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _i64(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        batch = batch.set_column(
            batch.schema.get_field_index(c), c, pc.cast(batch[c], pa.int64())
        )
    return batch


def _cents(col) -> pa.Array:
    return pc.cast(
        # duckdb round() is half-away-from-zero = arrow "half_towards_infinity"
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------------------
# Events: aggregate / windows / top-k / distinct
# ---------------------------------------------------------------------------


@query(
    "events_agg",
    """SELECT event_type, count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       FROM events GROUP BY event_type""",
)
def events_agg(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "value_cents": _cents(b["value"])}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


@query(
    "events_tumbling",
    """SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS window,
              count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       FROM events GROUP BY 1, 2""",
)
def events_tumbling(sf_dir: str):
    from logpipe_ray.stages.window import tumbling_aggregate

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return tumbling_aggregate(ds, width_s=3600)


@query(
    "events_session",
    """WITH lagd AS (
         SELECT user_id, ts, value,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events
       ), sess AS (
         SELECT user_id, value,
                SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) <= 1800
                         THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
         FROM lagd
       )
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       FROM sess GROUP BY 1, 2""",
)
def events_session(sf_dir: str):
    from logpipe_ray.stages.window import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return sessionize(ds, gap_s=1800)


@query(
    "events_topk",
    """SELECT user_id,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
       FROM events GROUP BY user_id
       ORDER BY total_cents DESC, user_id LIMIT 10""",
)
def events_topk(sf_dir: str):
    from logpipe_ray.stages.window import top_k

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return top_k(ds, key_col="user_id", value_col="value", k=10)


@query("events_distinct_types", "SELECT DISTINCT event_type FROM events")
def events_distinct_types(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, type=pa.string())})


# ---------------------------------------------------------------------------
# Relational: pricing aggregate, joins, sort/top-k
# ---------------------------------------------------------------------------


@query(
    "q1_pricing",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                AS sum_base_cents,
              CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
                   AS BIGINT) AS sum_disc_cents,
              count(*) AS n_rows
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1995-06-30'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    from datetime import datetime

    cutoff = pa.scalar(datetime(1995, 6, 30), type=pa.timestamp("us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "base_cents": _cents(b["l_extendedprice"]),
                "disc_cents": _cents(disc_price),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="n_rows"),
        )
    )


@query(
    "join_broadcast",
    """SELECT p_brand, count(*) AS n_items,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""",
)
def join_broadcast(sf_dir: str):
    """Fact ⋈ small dimension: broadcast hash join, no shuffle."""
    import pyarrow.parquet as pq

    from logpipe_ray.stages.joins import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    joined = broadcast_join(ds, part, keys="l_partkey", right_keys="p_partkey")

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"p_brand": b["p_brand"], "qty": pc.cast(b["l_quantity"], pa.int64())}
        )

    return (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_items"), Sum("qty", alias_name="sum_qty"))
    )


@query(
    "join_hash",
    """SELECT c_mktsegment, count(*) AS n_orders,
              CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                AS sum_total_cents
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_hash(sf_dir: str):
    """Large×large hash-partitioned join (Dataset.join, 8 partitions)."""
    from logpipe_ray.stages.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(
        orders, customer, on="o_custkey", right_on="c_custkey", num_partitions=8
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "total_cents": _cents(b["o_totalprice"]),
            }
        )

    return (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("total_cents", alias_name="sum_total_cents"),
        )
    )


@query(
    "join_semi",
    """SELECT c_custkey FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
)
def join_semi(sf_dir: str):
    """Semi join via broadcast key set (Bloom-filter pattern)."""
    import pyarrow.parquet as pq

    from logpipe_ray.stages.joins import semi_join

    keys = pc.unique(
        pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"])["o_custkey"]
        .combine_chunks()
    )
    ds = _read(sf_dir, "customer", ["c_custkey"])
    return semi_join(ds, keys, key_col="c_custkey")


@query(
    "join_anti",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders WHERE o_totalprice >= 400000)""",
)
def join_anti(sf_dir: str):
    """Customers with no large order (anti join via broadcast key set)."""
    import pyarrow.parquet as pq

    from logpipe_ray.stages.joins import semi_join

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    big = orders.filter(pc.greater_equal(orders["o_totalprice"], 400000.0))
    keys = pc.unique(big["o_custkey"].combine_chunks())
    ds = _read(sf_dir, "customer", ["c_custkey"])
    return semi_join(ds, keys, key_col="c_custkey", anti=True)


@query(
    "sort_topk_orders",
    """SELECT o_orderkey,
              CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
       FROM orders
       ORDER BY total_cents DESC, o_orderkey LIMIT 10""",
)
def sort_topk_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "total_cents": _cents(b["o_totalprice"])}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort(["total_cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )
