"""The reference's daily schedule (O3, dags/etl_pipeline.py:38) mapped to
engine code: one run processes ONE day's slice of the sales table and
replaces exactly that day's partition of the output — re-running a day is
idempotent (the reference's "Data Accumulation Issue", README.md:561,
solved structurally instead of by TRUNCATE).

At 100 TB this is the core production loop: the input scan partition-prunes
to the run date, the output write touches only that date's directory
(dynamic partition overwrite), and N days backfill as N independent jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Observation

from ..operators.cleaning import clean_sales


def daily_summary(sales: DataFrame, run_date: str, observation: Observation | None = None) -> DataFrame:
    """Per-product totals for ONE day: filter(run_date) → clean → agg.
    The date filter sits on the raw column so it prunes partitions/row
    groups before anything else runs.

    Pass an ``Observation`` to collect data-quality telemetry (rows in /
    rows surviving cleaning) for free during the write — no second pass
    over the data, which matters when the day is terabytes."""
    day = sales.filter(F.col("sale_date") == F.lit(run_date).cast("date"))
    cleaned = clean_sales(day)
    if observation is not None:
        cleaned = cleaned.observe(
            observation,
            F.count(F.lit(1)).alias("rows_clean"),
            F.sum("sale_amount").alias("amount_clean"),
        )
    return (
        cleaned.groupBy("product_id")
        .agg(
            F.sum("quantity").alias("total_quantity"),
            F.round(F.sum("sale_amount"), 2).alias("total_sale_amount"),
        )
        .withColumn("sale_date", F.lit(run_date).cast("date"))
    )


def run_daily(spark: SparkSession, sales: DataFrame, run_date: str, out_path: str) -> None:
    """Execute one scheduled run: compute the day's summary and replace
    ONLY that day's partition (dynamic partition overwrite) — sibling
    days are untouched, re-runs replace rather than accumulate."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        daily_summary(sales, run_date).write.mode("overwrite").partitionBy(
            "sale_date"
        ).parquet(out_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
