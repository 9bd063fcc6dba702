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

from .operators.aggregate import aggregate_sales, summary_ordered
from .operators.cleaning import clean_sales, to_typed
from .operators.union_ops import union_sources
from .plans.retail import retail_summary
from .sources.readers import load_table, sales_from_lineitem

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
