"""TPC-H-style analytical plans over the driver star schema — the
extension tier the reference lacks entirely (SURVEY.md §2.5, §7.3 step 4).

Each plan is declarative DataFrame API so Catalyst pushes filters into the
parquet scans, prunes columns, and picks broadcast vs sort-merge joins.

Float determinism: computed money terms (price*(1-disc) etc.) are rounded
to cents PER ROW before aggregation. A single multiply is bit-identical
across engines, while sums of unrounded products differ by ulps that can
straddle a .005 rounding boundary; summing cent-rounded terms keeps the
total ~1e-11 away from any boundary, so the final ROUND matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cents
from ..operators.joins import broadcast_dim_join, fact_join
from ..sources.readers import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over filtered lineitem. One scan,
    partial+final hash agg, tiny 4-group result."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast customer dim, sort-merge orders⋈lineitem,
    group by order. Customer filter prunes before the join."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    joined = fact_join(
        broadcast_dim_join(orders, cust.select("c_custkey"), on=[F.col("o_custkey") == F.col("c_custkey")]),
        li,
        on=[F.col("o_orderkey") == F.col("l_orderkey")],
    )
    revenue = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(revenue), 2).alias("revenue")
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake of broadcast dims (region→nation→customer)
    onto the orders⋈lineitem fact join; revenue per customer nation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    dims = broadcast_dim_join(
        broadcast_dim_join(cust, nation, on=[F.col("c_nationkey") == F.col("n_nationkey")]),
        region,
        on=[F.col("n_regionkey") == F.col("r_regionkey")],
    ).select("c_custkey", "n_name")
    fact = fact_join(orders, li, on=[F.col("o_orderkey") == F.col("l_orderkey")])
    joined = broadcast_dim_join(fact, dims, on=[F.col("o_custkey") == F.col("c_custkey")])
    revenue = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return joined.groupBy("n_name").agg(F.round(F.sum(revenue), 2).alias("revenue"))


def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast part-dim join: revenue + volume per brand."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem")
    joined = broadcast_dim_join(li, part, on=[F.col("l_partkey") == F.col("p_partkey")])
    return joined.groupBy("p_brand").agg(
        F.round(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2).alias("revenue"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )
