"""Registry mapping query names → (Spark callable, DuckDB oracle SQL).

Contract rules (see __spark_entry__ docstring):
- Output column names identical between Spark and SQL (driver sorts columns
  by name before hashing).
- Float aggregates rounded on BOTH sides (order-of-accumulation noise).
- Any ranking/top-k has a deterministic total order (unique tiebreak key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import cents
from .operators.cleaning import to_typed
from .operators.joins import broadcast_dim_join
from .operators.union_ops import union_sources
from .operators.windows import running_total, sessionize, topk_per_group
from .plans import tpch
from .plans.retail import retail_summary
from .sources.readers import load_events, load_table, sales_from_lineitem

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Reference surface (SURVEY.md §2): scans, casts, union, clean, aggregate
# ---------------------------------------------------------------------------


@query(
    "sales_summary",
    oracle="""
    SELECT l_partkey AS product_id,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity,
           ROUND(SUM(l_extendedprice), 2) AS total_sale_amount
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice > 0
    GROUP BY l_partkey
    ORDER BY product_id
    """,
)
def q_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (A1 + F1 + F2 + U1): per-product totals across channels.
    Reference aggregate_sales, scripts/transformation.py:95-121."""
    return retail_summary(spark, sf_dir)


@query(
    "union_channels",
    oracle="""
    SELECT source,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity,
           ROUND(SUM(l_extendedprice), 2) AS total_sale_amount
    FROM (
        SELECT 'online' AS source, * FROM lineitem WHERE l_orderkey % 2 = 0
        UNION ALL
        SELECT 'in_store' AS source, * FROM lineitem WHERE l_orderkey % 2 <> 0
    )
    GROUP BY source
    """,
)
def q_union_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 unionByName (reference pd.concat, scripts/transformation.py:166):
    bag semantics, aligned by name, duplicates kept."""
    sales = sales_from_lineitem(spark, sf_dir)
    online = sales.filter(F.col("source") == "online")
    in_store = sales.filter(F.col("source") == "in_store")
    return union_sources(online, in_store).groupBy("source").agg(
        F.count("*").alias("n_rows"),
        F.sum("quantity").cast("long").alias("total_quantity"),
        F.round(F.sum("sale_amount"), 2).alias("total_sale_amount"),
    )


@query(
    "cast_roundtrip",
    oracle="""
    SELECT product_id,
           CAST(SUM(quantity) AS BIGINT) AS total_quantity,
           ROUND(SUM(sale_amount), 2) AS total_sale_amount
    FROM (
        SELECT CAST(CAST(l_partkey AS VARCHAR) AS BIGINT) AS product_id,
               CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS BIGINT) AS quantity,
               CAST(CAST(l_extendedprice AS VARCHAR) AS DOUBLE) AS sale_amount
        FROM lineitem
    )
    WHERE quantity > 0 AND sale_amount > 0
    GROUP BY product_id
    """,
)
def q_cast_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hostile-typing mode (P1→P2, FIXTURES.md F5): every column erased to
    string (the reference's ::text transport, scripts/extraction.py:60-68)
    then re-cast by the typed layer. Verifies cast semantics match."""
    li = load_table(spark, sf_dir, "lineitem")
    raw = li.select(
        F.col("l_partkey").cast("string").alias("product_id"),
        F.col("l_quantity").cast("long").cast("string").alias("quantity"),
        F.col("l_extendedprice").cast("string").alias("sale_amount"),
    )
    typed = to_typed(raw, {"product_id": "long", "quantity": "long", "sale_amount": "double"})
    cleaned = typed.filter((F.col("quantity") > 0) & (F.col("sale_amount") > 0))
    return cleaned.groupBy("product_id").agg(
        F.sum("quantity").cast("long").alias("total_quantity"),
        F.round(F.sum("sale_amount"), 2).alias("total_sale_amount"),
    )


@query(
    "clean_filter",
    oracle="""
    SELECT l_orderkey AS sale_id, l_linenumber AS line_no, l_partkey AS product_id,
           CAST(l_quantity AS BIGINT) AS quantity,
           l_extendedprice AS sale_amount
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_quantity > 25 AND l_extendedprice > 0
    """,
)
def q_clean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + F2 at row level (reference clean_data,
    scripts/transformation.py:64-93): any-null drop + strict positive
    filter, with a selective predicate so pushdown matters. Predicates
    reach the parquet scan (PushedFilters in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select(
        F.col("l_orderkey").alias("sale_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").cast("long").alias("quantity"),
        F.col("l_extendedprice").alias("sale_amount"),
    )
    df = df.na.drop("any", subset=["quantity", "sale_amount"])
    return df.filter((F.col("quantity") > 25) & (F.col("sale_amount") > 0))


# ---------------------------------------------------------------------------
# Extension tier: joins, wide aggregates, windows (SURVEY.md §7.3 step 4)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100), 2) AS sum_disc_price,
           ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q1_pricing_summary(spark, sf_dir)


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey, o_orderdate,
           ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100), 2) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def q_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q3_shipping_priority(spark, sf_dir)


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n_name, ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100), 2) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q5_region_revenue(spark, sf_dir)


@query(
    "brand_revenue",
    oracle="""
    SELECT p_brand,
           ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100), 2) AS revenue,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    """,
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.brand_revenue(spark, sf_dir)


@query(
    "top3_lines_per_brand",
    oracle="""
    SELECT p_brand, l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue, rnk
    FROM (
        SELECT p_brand, l_orderkey, l_linenumber, l_extendedprice, l_discount,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY l_extendedprice * (1 - l_discount) DESC, l_orderkey, l_linenumber
               ) AS rnk
        FROM lineitem JOIN part ON p_partkey = l_partkey
    )
    WHERE rnk <= 3
    """,
)
def q_top3_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: Window row_number with a unique tiebreak
    (l_orderkey, l_linenumber) — deterministic, shuffle only on p_brand."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem")
    joined = broadcast_dim_join(li, part, on=[F.col("l_partkey") == F.col("p_partkey")])
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    topk = topk_per_group(
        joined.withColumn("__rev", revenue),
        partition_by=["p_brand"],
        order_by=[F.col("__rev").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        k=3,
    )
    return topk.select(
        "p_brand", "l_orderkey", "l_linenumber", cents(F.col("__rev")).alias("revenue"), "rnk"
    )


@query(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def q_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer: one shuffle on o_custkey, streaming
    frame evaluation. Accumulation order is pinned by (o_orderdate,
    o_orderkey) so the double prefix-sums are bit-identical to the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    rt = running_total(
        orders,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        value_col="o_totalprice",
        out_col="running_spend",
    )
    return rt.select("o_custkey", "o_orderkey", "running_spend")


@query(
    "rollup_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set subtotals (rollup): Spark expands grouping sets in one
    pass; nulls mark subtotal rows exactly as in ANSI SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.count("*").alias("n_lines"),
    )


@query(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS not_specified,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra pass to discover values;
    deterministic column order), empty cells coalesced to 0."""
    orders = load_table(spark, sf_dir, "orders")
    values = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    aliases = ["urgent", "high", "medium", "not_specified", "low"]
    pv = orders.groupBy("o_orderstatus").pivot("o_orderpriority", values).agg(F.count(F.lit(1)))
    return pv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a) for v, a in zip(values, aliases)],
    )


# ---------------------------------------------------------------------------
# Event-time operators over the events table
# ---------------------------------------------------------------------------


@query(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time aggregate (batch form; streaming twin in
    streaming/windows.py uses F.window + watermark)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM flagged
    GROUP BY user_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap): lag + cumulative boundary count
    per user, then per-user session stats. Gap arithmetic is integer
    microseconds on both sides — no float truncation mismatch."""
    ev = load_events(spark, sf_dir)
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak_col="event_id")
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
