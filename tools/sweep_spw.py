"""One-shot discovery sweep: which registry queries plan an Exchange
SinglePartition feeding a Window? Output feeds the allowlist in
tests/test_plan_lint.py (r10 verdict #2)."""

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from etl_pipeline_for_retail_sales_data_spark.planlint import (
    single_partition_window_feeds,
)
from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sf = "/root/testdata/sf0.001"
flagged = {}
for name in sorted(QUERIES):
    try:
        df = QUERIES[name](spark, sf)
        txt = df._jdf.queryExecution().executedPlan().toString()
    except Exception as e:  # noqa: BLE001
        print(f"PLANFAIL {name}: {str(e).splitlines()[0][:100]}", flush=True)
        continue
    wins = single_partition_window_feeds(txt)
    if wins:
        flagged[name] = wins
        print(f"FLAG {name}", flush=True)
        for w in wins:
            print(f"    {w[:160]}", flush=True)
    spark.catalog.clearCache()

print(f"\nTOTAL flagged: {len(flagged)} / {len(QUERIES)}")
